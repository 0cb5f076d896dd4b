"""Capture a device trace of the benchmark-config chunked step.

Usage (from the repo root): python scripts/profile_step.py [/tmp/trace_dir]
Aggregate with scripts/trace_agg.py afterwards.
"""
import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))
import sys
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair
from splice_tpu.utils.profiling import maybe_trace

cfg = load_config(None, dict(
    dataroot="datasets/splicing/cows", seed=3,
    vit_compute_dtype="bfloat16", use_pallas_attention=True,
    remat_vit=True))
pair = load_pair(cfg)
extractor = trainer.make_extractor_from_config(cfg)
program = trainer.build_program(cfg, pair, extractor)
state = program.init_state(jax.random.PRNGKey(3))
key = jax.random.PRNGKey(4)
lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
CH = 10
# warmup/compile
state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(1),
                                  key, lam, CH)
_ = float(parts["loss"])

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
with maybe_trace(outdir):
    i = 1 + CH
    for _n in range(2):   # 2 x 10-step chunks
        state, parts = program.step_chunk(state, pair.A, pair.B,
                                          jnp.int32(i), key, lam, CH)
        i += CH
    _ = float(parts["loss"])
print("trace done, steps:", i - 1 - CH)
