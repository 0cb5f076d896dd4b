"""Probe: does a K=64 contraction cost the same as K=128 on the MXU?

Decides whether packing two dh=64 attention heads into one K=128 dot
(VERDICT r03 lever b) can pay: if the [N,64]x[64,N] dot runs at the same
wall time as [N,128]x[128,N], half of every QK^T / PV pass is idle and
packing could ~halve the attention dot time. If K=64 runs ~2x faster,
the MXU streams partial-depth contractions efficiently and the lever is
dead (log as measured negative).

Usage: python scripts/mxu_k_probe.py
"""
import pathlib as _p
import sys as _s
_s.path.insert(0, str(_p.Path(__file__).resolve().parents[1]))
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(reps: int, a_ref, b_ref, o_ref):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for _ in range(reps):
        acc += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def time_dot(n: int, k: int, reps: int = 64, iters: int = 50) -> float:
    a = jnp.ones((n, k), jnp.bfloat16)
    b = jnp.ones((k, n), jnp.bfloat16)
    fn = pl.pallas_call(
        functools.partial(_kernel, reps),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(fn)
    fn(a, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(a, b)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / (iters * reps)
    return dt


def time_dot_mn(m: int, k: int, n: int, reps: int = 64,
                iters: int = 50) -> float:
    """Rectangular [m,k]x[k,n] timing (same kernel)."""
    a = jnp.ones((m, k), jnp.bfloat16)
    b = jnp.ones((k, n), jnp.bfloat16)
    fn = pl.pallas_call(
        functools.partial(_kernel, reps),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(fn)
    fn(a, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(a, b)
    o.block_until_ready()
    return (time.perf_counter() - t0) / (iters * reps)


if __name__ == "__main__":
    n = 768
    t64 = time_dot(n, 64)
    t128 = time_dot(n, 128)
    t256 = time_dot(n, 256)
    print(f"[{n},64]x[64,{n}]   : {t64 * 1e6:8.2f} us/dot")
    print(f"[{n},128]x[128,{n}] : {t128 * 1e6:8.2f} us/dot "
          f"(ratio vs K=64: {t128 / t64:.2f})")
    print(f"[{n},256]x[256,{n}] : {t256 * 1e6:8.2f} us/dot "
          f"(ratio vs K=128: {t256 / t128:.2f})")
    if t128 / t64 < 1.25:
        print("-> K=64 wastes ~half the MXU: head packing CAN pay")
    else:
        print("-> K=64 streams efficiently: head packing is a dead lever")
    # Output-lane width: does a 64-wide output run at the same wall time
    # as a 128-wide one (half the MXU array idle) or at ~half?  Decides
    # whether the PV / dq / dk / dv dots (output width dh=64) also want
    # pair-packing (one [m, k]x[k, 128] dot instead of two ...x[k, 64]).
    w64 = time_dot_mn(n, n, 64)
    w128 = time_dot_mn(n, n, 128)
    print(f"[{n},{n}]x[{n},64]  : {w64 * 1e6:8.2f} us/dot")
    print(f"[{n},{n}]x[{n},128] : {w128 * 1e6:8.2f} us/dot "
          f"(ratio vs W=64: {w128 / w64:.2f})")
    if w128 / w64 < 1.25:
        print("-> 64-wide outputs waste ~half the MXU: pack PV outputs")
    else:
        print("-> 64-wide outputs stream efficiently: leave PV dots")
