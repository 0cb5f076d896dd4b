"""Get optimized HLO text of the bench chunk program via AOT compile."""
import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair

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

fn = jax.jit(lambda s, A, B, i, k, l: program.step_chunk(s, A, B, i, k, l, 10))
lowered = fn.lower(state, pair.A, pair.B, jnp.int32(1), key, lam)
comp = lowered.compile()
txt = comp.as_text()
with open("/tmp/chunk_opt.hlo", "w") as f:
    f.write(txt)
print("HLO chars:", len(txt))
