import time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair

which = sys.argv[1]
if which == "512":
    cfg = load_config(None, dict(dataroot="datasets/splicing/cows", seed=3,
                                 A_resize=512, B_resize=512))
elif which == "dinov2":
    cfg = load_config(None, dict(dataroot="datasets/splicing/cows", seed=3,
                                 A_resize=512, B_resize=512,
                                 dino_model_name="dinov2_vitl14",
                                 remat_vit=True))
elif which == "480loss":
    # high-res loss: shorter side 448 (config 2 flavor: bigger ViT tokens)
    cfg = load_config(None, dict(dataroot="datasets/splicing/cows", seed=3,
                                 dino_global_patch_size=448,
                                 dino_global_max_size=896, remat_vit=True))
pair = load_pair(cfg)
extractor = trainer.make_extractor_from_config(cfg)
program = trainer.build_program(cfg, pair, extractor)
state = program.init_state(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)
lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
t0 = time.time()
state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(1), key, lam, 10)
l0 = float(parts["loss"]); print(f"compile+10 steps: {time.time()-t0:.0f}s loss={l0:.3f}", flush=True)
t0 = time.time()
for j in range(2):
    state, parts = program.step_chunk(state, pair.A, pair.B,
                                      jnp.int32(11 + 10*j), key, lam, 10)
l1 = float(parts["loss"])
dt = time.time()-t0
print(f"{which}: {20/dt:.2f} steps/s ({dt/20*1000:.0f} ms/step), loss {l0:.3f}->{l1:.3f}", flush=True)
