"""Measure the sustained CLI rate and attribute the residual vs bench.py.

Phases, each explicitly block_until_ready-timed:
  compile   build_program + first entire/chunk/render_u8/render invocations
  sustain   300 regular steps in 10-step chunks, log-cadence renders queued
            exactly like train_pair's loop (render_u8 every 10 steps to the
            async saver + async metrics log), wall includes the final drain
  tail      final render_u8 + must_write PNG + fp32 render (train_pair's
            post-loop work)

Usage: python scripts/cli_rate.py [n_steps]
"""
import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair
from splice_tpu.utils.io import AsyncImageSaver
from splice_tpu.utils.metrics import MetricsLogger

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300
OUT = "/tmp/cli_rate_probe"
_pathlib.Path(OUT).mkdir(parents=True, exist_ok=True)

cfg = load_config(None, dict(dataroot="datasets/splicing/cows", seed=3))
trainer.setup_compile_cache(cfg)
pair = load_pair(cfg)
extractor = trainer.make_extractor_from_config(cfg)

t0 = time.perf_counter()
program = trainer.build_program(cfg, pair, extractor)
state = program.init_state(jax.random.PRNGKey(3))
key = jax.random.PRNGKey(4)
lam0 = jnp.asarray(trainer.lambdas_vec(cfg, 0))
lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))


def _t(label, fn):
    t = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t
    print(f"  compile+run {label}: {dt:.1f}s", flush=True)
    return out


state, _ = _t("entire", lambda: program.step_entire(
    state, pair.A, pair.B, jnp.int32(0), key, lam0))
state, parts = _t("chunk10", lambda: program.step_chunk(
    state, pair.A, pair.B, jnp.int32(1), key, lam, 10))
u8 = _t("render_u8", lambda: program.render_u8(state["params"], pair.A))
_t("render_fp32", lambda: program.render(state["params"], pair.A))
print(f"compile phase total: {time.perf_counter() - t0:.1f}s", flush=True)

# Sustained phase: replicate the hot loop's per-log work (render_u8 to the
# async saver + async metrics record) at the reference cadence
# (log_images_freq=10, reference train.py:70-74), chunked by 10.
saver = AsyncImageSaver()
logger = MetricsLogger(f"{OUT}/metrics.jsonl")
t0 = time.perf_counter()
i = 11
n_logs = 0
for c in range(N // 10):
    state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(i),
                                      key, lam, 10)
    i += 10
    u8 = program.render_u8(state["params"], pair.A)
    saver.save(u8, f"{OUT}/output.png", must_write=False)
    logger.log_async(i - 1, dict(parts), {"lr": cfg.lr},
                     with_memory=(c % 10 == 0))
    n_logs += 1
jax.block_until_ready(state["params"])
sustain = time.perf_counter() - t0
n_done = (N // 10) * 10
print(f"sustained: {n_done} steps in {sustain:.1f}s = "
      f"{n_done / sustain:.2f} steps/s ({n_logs} log renders)", flush=True)

# Without the log-cadence renders (pure chunks), same window:
t0 = time.perf_counter()
for c in range(N // 10):
    state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(i),
                                      key, lam, 10)
    i += 10
jax.block_until_ready(state["params"])
bare = time.perf_counter() - t0
print(f"bare chunks: {n_done} steps in {bare:.1f}s = "
      f"{n_done / bare:.2f} steps/s", flush=True)

t0 = time.perf_counter()
u8 = program.render_u8(state["params"], pair.A)
saver.save(u8, f"{OUT}/output.png", must_write=True)
saver.close()
logger.close()
print(f"tail (final render_u8 + must_write PNG + close): "
      f"{time.perf_counter() - t0:.1f}s", flush=True)
