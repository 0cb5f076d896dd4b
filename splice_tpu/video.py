"""Video appearance transfer: per-frame test-time optimization with
warm-started generator weights (BASELINE.json config 4; a NEW capability —
the reference never saves weights, so every frame would restart from scratch,
SURVEY.md §5 checkpoint note).

Layout: <dataroot>/A contains the ordered frames, <dataroot>/B the single
appearance image. Frame k's generator initializes from frame k-1's final
params; later frames therefore need far fewer steps than the first.
"""
from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Any, Dict, Iterable, Iterator, Optional

from splice_tpu.config import Config
from splice_tpu.data import load_video_frames
from splice_tpu.utils.io import AsyncImageSaver
from splice_tpu.utils.metrics import MetricsLogger


def _prefetch(it: Iterable, depth: int = 1) -> Iterator:
    """Run the frame loader (PIL decode + resize + h2d upload) one frame
    ahead in a thread, overlapping it with the current frame's device
    optimization instead of serializing between frames."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:     # surface loader errors in the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def train_video(cfg: Config,
                first_frame_steps: Optional[int] = None,
                warm_frame_steps: Optional[int] = None) -> Dict[str, Any]:
    """Optimize each frame sequentially; returns per-frame stats.

    first_frame_steps defaults to cfg.n_epochs; warm frames default to
    cfg.n_epochs // 10 (warm start converges much faster).
    """
    from splice_tpu import trainer  # local import: keep module load light

    trainer.setup_compile_cache(cfg)
    # `x if x is not None else default`: an explicit 0 ("just re-render
    # with the warm-started params") must not fall back to the default.
    first_steps = (first_frame_steps if first_frame_steps is not None
                   else cfg.n_epochs)
    warm_steps = (warm_frame_steps if warm_frame_steps is not None
                  else max(cfg.n_epochs // 10, 1))
    extractor = trainer.make_extractor_from_config(cfg)

    out_dir = os.path.join(cfg.dataroot, "out")
    params = None
    stats = []
    program = None
    program_shapes = None
    # ONE saver thread and ONE metrics logger for the whole clip: per-frame
    # creation + close() made every frame wait for its PNG d2h/write and
    # join the metrics worker (each drain is a tunnel roundtrip); sharing
    # keeps the frame loop free of blocking IO entirely.
    saver = AsyncImageSaver()
    logger = MetricsLogger(cfg.metrics_path
                           or os.path.join(out_dir, "metrics.jsonl"))
    try:
        for idx, (name, pair) in enumerate(_prefetch(load_video_frames(cfg))):
            steps = first_steps if idx == 0 else warm_steps
            if program is None or program_shapes != (pair.A.shape,
                                                     pair.B.shape):
                # Frames share one geometry; build (and jit-compile) the
                # step once and reuse it for every subsequent frame.
                program = trainer.build_program(cfg, pair, extractor)
                program_shapes = (pair.A.shape, pair.B.shape)
            # Warm frames log once at frame end: each intra-frame render
            # is a multi-MB device-to-host transfer whose async drain
            # contends with the NEXT frame's dispatch stream through a
            # remote-TPU tunnel (measured: steady-state frames ran ~40%
            # slower with per-10-step dumps). The per-frame output below
            # is the artifact video mode is for; cfg.video_log_frames_only
            # = False restores intra-frame log_images_freq cadence.
            fcfg = cfg
            if idx > 0 and cfg.video_log_frames_only:
                fcfg = dataclasses.replace(
                    cfg, log_images_freq=max(cfg.log_images_freq, steps))
            res = trainer.train_pair(fcfg, pair=pair, extractor=extractor,
                                     init_params=params, n_steps=steps,
                                     program=program, saver=saver,
                                     logger=logger, want_output=False)
            params = res["state"]["params"]
            stem = os.path.splitext(name)[0]
            # uint8 device array: the d2h happens in the saver thread.
            saver.save(res["output_u8"],
                       os.path.join(out_dir, f"{stem}_out.png"),
                       must_write=True)
            stats.append({"frame": name, "steps": steps,
                          "steps_per_sec": res["steps_per_sec"],
                          "loss": res["losses"].get("loss")})
            print(f"[video] frame {idx} ({name}): {steps} steps, "
                  f"{res['steps_per_sec']:.2f} steps/s")
    finally:
        saver.close()
        logger.close()
    return {"frames": stats, "params": params}
