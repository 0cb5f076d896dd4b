"""Bisect which generator shape faults the Pallas conv on TPU."""
import sys
import jax, jax.numpy as jnp, numpy as np
from splice_tpu.models import unet

gcfg = unet.SkipConfig()
gp = unet.init_skip_params(jax.random.PRNGKey(0), gcfg)
mode = sys.argv[1]

def run(tag, fn, *args):
    out = fn(*args)
    s = sum(float(jnp.sum(t.astype(jnp.float32))) for t in jax.tree.leaves(out))
    print(f"{tag}: ok ({s:.3f})", flush=True)

if mode == "fwd896":
    x = jnp.zeros((1, 896, 896, 3))
    run("fwd 896", lambda x: unet.skip_apply_chw(gp, gcfg, x, jnp.bfloat16), x)
elif mode == "fwd_dual":
    xs = jnp.zeros((2, 1, 896, 896, 3))
    run("fwd dual vmap", jax.jit(lambda xs: jax.vmap(
        lambda x: unet.skip_apply_chw(gp, gcfg, x, jnp.bfloat16))(xs)), xs)
elif mode == "bwd896":
    x = jnp.zeros((1, 896, 896, 3))
    run("bwd 896", jax.jit(jax.grad(lambda p, x: jnp.sum(
        unet.skip_apply_chw(p, gcfg, x, jnp.bfloat16)))), gp, x)
elif mode == "bwd_entire":
    x = jnp.zeros((1, 900, 1200, 3))
    run("bwd entire 900x1200", jax.jit(jax.grad(lambda p, x: jnp.sum(
        unet.skip_apply_chw(p, gcfg, x, jnp.bfloat16)))), gp, x)
elif mode == "fwd_entire":
    x = jnp.zeros((1, 900, 1200, 3))
    run("fwd entire", jax.jit(lambda x: unet.skip_apply_chw(
        gp, gcfg, x, jnp.bfloat16)), x)
print("DONE", flush=True)
