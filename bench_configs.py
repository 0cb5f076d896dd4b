#!/usr/bin/env python
"""Benchmark the five BASELINE.json tracked configs on the current device
and (re)write BENCHMARKS.md. One JSON line per config on stdout.

Configs (BASELINE.json "configs", SURVEY.md §6):
  a) default 224px pair (same workload bench.py reports)
  b) high-res 512px pair with a multi-crop augmentation batch
  c) batched optimization over 8 independent pairs in one compiled step
     (dp-sharded on a slice; dp=1 on this single-chip environment)
  d) video mode: per-frame optimization, warm-started generator weights
  e) backbone swap: DINOv2 ViT-L/14

Run: python bench_configs.py [--quick]
"""
import argparse
import json
import os
import pathlib
import shutil
import time

REPO = pathlib.Path(__file__).resolve().parent

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from splice_tpu import trainer  # noqa: E402
from splice_tpu.config import load_config  # noqa: E402
from splice_tpu.data import load_pair  # noqa: E402

COWS = str(REPO / "datasets/splicing/cows")
ORANGES = str(REPO / "datasets/splicing/apples2oranges")


def _steady_rate(cfg, n_chunks: int = 4, chunk: int = 10) -> float:
    """Compile both step classes, then time n_chunks x chunk regular
    steps (the hot loop's shape of work)."""
    pair = load_pair(cfg)
    extractor = trainer.make_extractor_from_config(cfg)
    program = trainer.build_program(cfg, pair, extractor)
    state = program.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    lam0 = jnp.asarray(trainer.lambdas_vec(cfg, 0))
    lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
    state, _ = program.step_entire(state, pair.A, pair.B, jnp.int32(0), key,
                                   lam0)
    state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(1),
                                      key, lam, chunk)
    assert np.isfinite(float(parts["loss"]))
    t0 = time.perf_counter()
    i = 1 + chunk
    for _ in range(n_chunks):
        state, parts = program.step_chunk(state, pair.A, pair.B,
                                          jnp.int32(i), key, lam, chunk)
        i += chunk
    assert np.isfinite(float(parts["loss"]))
    return n_chunks * chunk / (time.perf_counter() - t0)


def config_a(quick: bool) -> dict:
    cfg = load_config(None, dict(dataroot=COWS, seed=3, remat_vit=True))
    return {"config": "a_default_224", "steps_per_sec":
            round(_steady_rate(cfg, n_chunks=2 if quick else 4), 3),
            "unit": "steps/s",
            "detail": "cows pair, dino_vitb8, n_crops=1, full-res generator. "
                      "Same workload as `bench.py`, shorter window (40 steps "
                      "vs 200 x 2 seeds) — `bench.py`'s number is the "
                      "authoritative headline; a ~2% gap is window noise"}


def config_b(quick: bool) -> dict:
    cfg = load_config(None, dict(
        dataroot=COWS, seed=3, remat_vit=True, A_resize=512, B_resize=512,
        global_A_crops_n_crops=2, global_B_crops_n_crops=2))
    return {"config": "b_512px_multicrop", "steps_per_sec":
            round(_steady_rate(cfg, n_chunks=2 if quick else 4), 3),
            "unit": "steps/s",
            "detail": "512px pair, 2 crops per side per step"}


def config_c(quick: bool) -> dict:
    """Steady-state rate of the multi-pair program (compile excluded)."""
    import dataclasses as dc
    from splice_tpu.parallel import mesh as mesh_lib
    from splice_tpu.parallel.pair_parallel import (
        build_multi_pair_program, load_pair_batch)
    n_dev = len(jax.devices())
    dp = n_dev  # all local devices; 1 on the single-chip env
    cfg = load_config(None, dict(dataroot=COWS, seed=3, remat_vit=True,
                                 n_pairs=8, mesh_dp=dp))
    mesh = mesh_lib.make_mesh(dp=dp, tp=1)
    extractor = trainer.make_extractor_from_config(cfg)
    extractor = dc.replace(
        extractor, params=mesh_lib.shard_vit_params(extractor.params, mesh))
    program = build_multi_pair_program(cfg, extractor, mesh, 224)
    batch = load_pair_batch(cfg, [COWS, ORANGES] * 4, 224)
    shard = mesh_lib.dp_sharding(mesh)
    As = jax.device_put(batch["A"], shard)
    Bs = jax.device_put(batch["B"], shard)
    with jax.set_mesh(mesh):
        states = program.init_states(jax.random.PRNGKey(0), 8)
        key = jax.random.PRNGKey(1)
        lam0 = jnp.asarray(trainer.lambdas_vec(cfg, 0))
        lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
        states, _ = program.step_entire(states, As, Bs, jnp.int32(0), key,
                                        lam0)
        states, parts = program.step_chunk(states, As, Bs, jnp.int32(1),
                                           key, lam, 10)
        assert np.all(np.isfinite(np.asarray(parts["loss"])))
        n_chunks = 2 if quick else 4
        t0 = time.perf_counter()
        i = 11
        for _ in range(n_chunks):
            states, parts = program.step_chunk(states, As, Bs,
                                               jnp.int32(i), key, lam, 10)
            i += 10
        assert np.all(np.isfinite(np.asarray(parts["loss"])))
        wall = time.perf_counter() - t0
    steps = n_chunks * 10
    return {"config": "c_8pairs_batched",
            "pair_steps_per_sec": round(steps * 8 / wall, 3),
            "steps_per_sec": round(steps / wall, 3),
            "unit": "pair-steps/s",
            "detail": f"8 pairs in one compiled chunked step, mesh dp={dp} "
                      f"({n_dev} device(s) visible — dp>1/tp>1 have never "
                      "run on real multi-chip hardware; they are validated "
                      "on the 8-device virtual CPU mesh and the driver's "
                      "`dryrun_multichip` only)"}


def config_d(quick: bool) -> dict:
    from splice_tpu.video import train_video
    # Synthesize a 3-frame clip from the cows pair (the repo bundles no
    # video); frames identical => measures the warm-start machinery cost.
    vroot = "/tmp/bench_video"
    shutil.rmtree(vroot, ignore_errors=True)
    os.makedirs(f"{vroot}/A"), os.makedirs(f"{vroot}/B")
    src_a = next(pathlib.Path(f"{COWS}/A").iterdir())
    src_b = next(pathlib.Path(f"{COWS}/B").iterdir())
    for i in range(3):
        shutil.copy(src_a, f"{vroot}/A/frame_{i:03d}{src_a.suffix}")
    shutil.copy(src_b, f"{vroot}/B/{src_b.name}")
    cfg = load_config(None, dict(dataroot=vroot, seed=3, remat_vit=True,
                                 video_mode=True, log_images_freq=10))
    first, warm = (30, 20) if quick else (60, 40)
    res = train_video(cfg, first_frame_steps=first, warm_frame_steps=warm)
    # Frame 0 pays all jit compiles; later frames reuse the program, so
    # the last frame's rate is the steady-state per-frame throughput.
    warm_rate = res["frames"][-1]["steps_per_sec"]
    return {"config": "d_video_warmstart",
            "steps_per_sec": round(warm_rate, 3),
            "unit": "steps/s (steady-state frame)",
            "detail": f"3 frames, {first}+2x{warm} steps, generator and "
                      "compiled step reused across frames",
            "frames": [{k: f[k] for k in ("frame", "steps")}
                       for f in res["frames"]]}


def config_e(quick: bool) -> dict:
    cfg = load_config(None, dict(dataroot=COWS, seed=3, remat_vit=True,
                                 dino_model_name="dinov2_vitl14"))
    return {"config": "e_dinov2_vitl14", "steps_per_sec":
            round(_steady_rate(cfg, n_chunks=2), 3), "unit": "steps/s",
            "detail": "DINOv2 ViT-L/14 backbone (24 layers, dim 1024)"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", default="abcde")
    args = ap.parse_args()
    from bench import probe_backend
    probe_backend()   # fail fast if the TPU tunnel is down (init hangs)
    dev = jax.devices()[0]
    results = []
    for name, fn in [("a", config_a), ("b", config_b), ("c", config_c),
                     ("d", config_d), ("e", config_e)]:
        if name not in args.configs:
            continue
        try:
            r = fn(args.quick)
        except Exception as e:  # keep going; report the failure
            r = {"config": name, "error": repr(e)[:300]}
        print(json.dumps(r), flush=True)
        results.append(r)

    # Merge with previous runs so partial invocations (--configs cd) keep
    # the other configs' numbers.
    store_path = REPO / "BENCH_CONFIGS.json"
    store = {}
    if store_path.exists():
        store = json.loads(store_path.read_text())
    for r in results:
        store[r["config"][0]] = r
    store_path.write_text(json.dumps(store, indent=2))
    results = [store[k] for k in sorted(store)]

    lines = [
        "# BENCHMARKS — measured TPU numbers for the BASELINE.json configs",
        "",
        f"Device: `{dev.device_kind}` x{len(jax.devices())}; "
        "regenerate with `python bench_configs.py`.",
        "",
        "The headline metric (config a) is what `bench.py` reports each "
        "round. Its `vs_baseline` multiplier divides by the measured "
        "**torch-CPU proxy** in `BASELINE_MEASURED.json` (the reference's "
        "GPU loop cannot run here: zero egress blocks its torch.hub "
        "backbone download, and there is no CUDA device) — so the "
        "multiplier compares TPU to CPU, not same-hardware "
        "implementations. Quote absolute steps/s unless the CPU-proxy "
        "caveat is stated alongside.",
        "",
        "| Config | Result | Notes |",
        "|---|---|---|",
    ]
    for r in results:
        if "error" in r:
            lines.append(f"| {r['config']} | ERROR | {r['error'][:80]} |")
            continue
        val = r.get("pair_steps_per_sec", r.get("steps_per_sec"))
        lines.append(f"| {r['config']} | {val} {r['unit']} | "
                     f"{r['detail']} |")
    lines.append("")
    # Preserve hand-maintained sections (e.g. "## Tools") below the
    # regenerated config table.
    md_path = REPO / "BENCHMARKS.md"
    extra = ""
    if md_path.exists():
        old = md_path.read_text()
        idx = old.find("\n## ")
        if idx != -1:
            extra = old[idx:]
    md_path.write_text("\n".join(lines) + extra)


if __name__ == "__main__":
    main()
