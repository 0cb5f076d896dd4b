"""Decompose the per-log-boundary cost of the CLI host loop.

Runs the same 300-step window under different log-work variants (compiles
are paid once, in-process):
  bare        chunks only
  render      + render_u8 dispatch each 10 steps (result dropped, no d2h)
  fetch       + np.asarray(render) on the loop thread (synchronous d2h)
  saver       + AsyncImageSaver.save (threaded d2h + native PNG encode)
  logmetrics  + MetricsLogger.log_async only (scalar fetch + mem RPC)
  full        saver + logmetrics (what train_pair does)

Usage: python scripts/cli_rate_variants.py
"""
import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp
import numpy as np

from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair
from splice_tpu.utils.io import AsyncImageSaver
from splice_tpu.utils.metrics import MetricsLogger

OUT = "/tmp/cli_rate_probe"
_pathlib.Path(OUT).mkdir(parents=True, exist_ok=True)

cfg = load_config(None, dict(dataroot="datasets/splicing/cows", seed=3))
trainer.setup_compile_cache(cfg)
pair = load_pair(cfg)
extractor = trainer.make_extractor_from_config(cfg)
program = trainer.build_program(cfg, pair, extractor)
state = program.init_state(jax.random.PRNGKey(3))
key = jax.random.PRNGKey(4)
lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))

# compile everything once (step_chunk donates its state arg, so a single
# rolling `state` threads through every variant — step indices don't
# matter for timing)
state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(1),
                                  key, lam, 10)
u8 = program.render_u8(state["params"], pair.A)
jax.block_until_ready(u8)
_ = float(parts["loss"])
print("compiled", flush=True)

N = 300


def run(variant: str) -> float:
    global state
    saver = AsyncImageSaver() if variant in ("saver", "full") else None
    logger = (MetricsLogger(f"{OUT}/m_{variant}.jsonl")
              if variant in ("logmetrics", "full") else None)
    t0 = time.perf_counter()
    i = 1
    for c in range(N // 10):
        state, parts = program.step_chunk(state, pair.A, pair.B,
                                          jnp.int32(i), key, lam, 10)
        i += 10
        if variant == "bare":
            continue
        u8 = program.render_u8(state["params"], pair.A)
        if variant == "fetch":
            np.asarray(u8)
        elif saver is not None:
            saver.save(u8, f"{OUT}/out_{variant}.png", must_write=False)
        if logger is not None:
            logger.log_async(i - 1, dict(parts), {"lr": cfg.lr},
                             with_memory=(c % 10 == 0))
    jax.block_until_ready(state["params"])
    if saver is not None:
        saver.close()
    if logger is not None:
        logger.close()
    dt = time.perf_counter() - t0
    print(f"{variant:11s}: {N / dt:6.2f} steps/s  ({dt:.1f}s, "
          f"{(dt - base) / (N // 10) * 1000:.0f} ms/log extra)"
          if variant != "bare" else
          f"{variant:11s}: {N / dt:6.2f} steps/s  ({dt:.1f}s)", flush=True)
    return dt


base = 0.0
base = run("bare")
for v in ("render", "fetch", "saver", "logmetrics", "full"):
    run(v)
