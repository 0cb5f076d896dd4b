import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.parallel import mesh as mesh_lib
from splice_tpu.parallel.pair_parallel import (build_multi_pair_program,
                                               load_pair_batch)

N_PAIRS = 4
cfg = load_config(None, dict(seed=3, entire_A_every=10 ** 9))
mesh = mesh_lib.make_mesh(dp=1, tp=1)
extractor = trainer.make_extractor_from_config(cfg)
prog = build_multi_pair_program(cfg, extractor, mesh, 448, 416)
roots = ["datasets/splicing/cows", "datasets/splicing/apples2oranges"] * 2
batch = load_pair_batch(cfg, roots[:N_PAIRS], 448)
As = jax.device_put(batch["A"], mesh_lib.dp_sharding(mesh))
Bs = jax.device_put(batch["B"], mesh_lib.dp_sharding(mesh))
with jax.set_mesh(mesh):
    states = prog.init_states(jax.random.PRNGKey(1), N_PAIRS)
    lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
    t0 = time.time()
    states, parts = prog.step_regular(states, As, Bs, jnp.int32(1),
                                      jax.random.PRNGKey(2), lam)
    l0 = np.asarray(parts["loss"])
    print(f"compile+1: {time.time()-t0:.0f}s losses={l0.round(2)}",
          flush=True)
    t0 = time.time()
    K = 30
    for i in range(2, 2 + K):
        states, parts = prog.step_regular(states, As, Bs, jnp.int32(i),
                                          jax.random.PRNGKey(2), lam)
    l1 = np.asarray(parts["loss"])   # sync
    dt = time.time() - t0
    print(f"multipair x{N_PAIRS} @448: {K/dt:.2f} steps/s = "
          f"{K*N_PAIRS/dt:.2f} pair-steps/s ({dt/K*1000:.0f} ms/step); "
          f"losses {l1.round(2)}", flush=True)
