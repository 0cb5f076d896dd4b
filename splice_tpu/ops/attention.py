"""Multi-head attention for the frozen ViT tower: XLA path + Pallas TPU kernel.

The reference reaches attention only through stock torch ops inside the
hub-loaded DINO ViT (SURVEY.md §2: the reference has zero native kernels).
This module is the TPU-native replacement and the framework's hot kernel:
every optimization step runs `depth` of these at batch 4*n_crops and
~800-3600 tokens, with gradients flowing through (reference util/losses.py
:81,90,103 differentiates through the frozen ViT).

Design: at Splice's token counts an entire head's K/V (< 1 MB) fits VMEM, so
the kernel keeps full K/V resident and tiles only queries — one softmax pass,
no online-max bookkeeping, logits never touch HBM. Backward is an exact
XLA-side recompute (custom VJP), which XLA fuses well and keeps the kernel
surface small. Falls back to pure-XLA attention for huge N or tiny shapes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target queries per grid step; full K/V kept in VMEM per (batch, head).
# The actual block is shrunk to the smallest multiple of 8 that still covers
# N in the same number of tiles (see _q_tiling). At the flagship N=785 the
# whole sequence rides in ONE q tile (bq=792, logits block 792x800 fp32 =
# 2.5 MB VMEM): measured 28.4 -> 29.1 steps/s e2e vs the round-2 4-tile
# blocking — 4x fewer grid cells amortizes kernel entry and keeps the MXU
# pipeline full at M=792 instead of M=200. _LOGITS_VMEM_BUDGET caps the
# fp32 logits block (the backward holds ~3 such arrays live), re-tiling
# long sequences (480px, ~3.6k tokens) back to multiple q tiles.
_BQ = 1024
_LOGITS_VMEM_BUDGET = 4 * 1024 * 1024
# The backward keeps ~3 [bq, n_pad] fp32 intermediates (p, dp, dl) live at
# once, so its per-array budget is smaller: 3 MB keeps the flagship N=785
# in ONE q tile (3 x 2.84 MB logits-sized arrays ~ 9 MB, measured fine)
# while re-tiling intermediate token counts (N ~ 840-1200) that would
# otherwise push 3 full-budget arrays past the ~16 MB VMEM ceiling
# (ADVICE r03; compile-smoke-tested over N in test_attention.py).
_BWD_LOGITS_VMEM_BUDGET = 3 * 1024 * 1024
# Above this padded length the full-K/V-in-VMEM plan stops fitting; fall back.
_MAX_N_PAD = 4096


def _q_tiling(n: int, budget: int = _LOGITS_VMEM_BUDGET,
              kv_len: int = 0) -> Tuple[int, int]:
    """(block_q, nq_pad): minimal 8-aligned q block covering n in the
    fewest tiles allowed by _BQ and the fp32-logits VMEM budget.

    budget caps ONE [bq, kv_len] fp32 logits block; callers holding
    several such arrays live (the backward keeps p/dp/dl) pass a
    proportionally smaller budget. kv_len defaults to n rounded up to a
    lane multiple (the split-tensor kernels' kv padding)."""
    kv = kv_len or pl.cdiv(n, 128) * 128
    max_bq = max(8, budget // (4 * kv))
    tiles = max(pl.cdiv(n, _BQ), pl.cdiv(n, max_bq))
    bq = pl.cdiv(pl.cdiv(n, tiles), 8) * 8
    return bq, bq * tiles


_HI = jax.lax.Precision.HIGHEST


def _sds(shape, dtype, like) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct for a pallas_call output, propagating `like`'s
    varying-manual-axes set: inside a check_vma=True shard_map (the
    manual-tp training path) pallas_call outputs must declare how they
    vary over the mesh axes — the kernel output varies exactly like its
    operands."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _xla_attention(q, k, v, scale, n_valid=None):
    """Plain XLA attention. q,k,v: [B, H, N, dh]. fp32 softmax.

    HIGHEST precision: exact for the dtype given (bf16 inputs still ride the
    MXU at full speed with fp32 accumulation; fp32 inputs are not silently
    downcast — JAX's DEFAULT precision is lossy even on CPU).

    n_valid: with a pre-padded token stream (see vit_forward), keys/values
    beyond n_valid are padding and are masked out of the softmax.
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=_HI,
                        preferred_element_type=jnp.float32) * scale
    if n_valid is not None and n_valid < q.shape[2]:
        logits = logits + _pad_mask_bias(n_valid, q.shape[2])
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      precision=_HI,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _attn_kernel(q_ref, k_ref, v_ref, *refs, scale: float):
    """One (batch*head, q-block) grid cell.

    q_ref: [1, BQ, dh]; k_ref/v_ref: [1, N_pad, dh]; o_ref: [1, BQ, dh]
    (leading dim is the size-1 batch*head block). bias_ref ([1, N_pad],
    0 valid / -1e30 pad) masks the padding columns in ONE broadcast add —
    the softmax is VPU-bound at these shapes, and the iota+compare+select
    form costs three [BQ, N_pad] passes where the add costs one. The
    division is deferred past the PV dot so it runs on [BQ, dh] instead of
    [BQ, N_pad] (exp(l - m) <= 1, so the unnormalized bf16 probabilities
    lose no range).
    """
    bias_ref, o_ref = (refs if len(refs) == 2 else (None, refs[0]))
    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [BQ, N_pad]
    if bias_ref is not None:
        logits = logits + bias_ref[...]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _pad_mask_bias(n_valid: int, n_pad: int):
    """[1, n_pad] additive mask row: 0 on valid columns, -1e30 on padding."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    return jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)


def _pallas_attention_fwd_impl(q, k, v, scale: float, n_valid: int = 0):
    B, H, N, dh = q.shape
    valid = n_valid or N
    n_pad = pl.cdiv(N, 128) * 128
    bq, nq_pad = _q_tiling(N)
    qp = jnp.pad(q.reshape(B * H, N, dh), ((0, 0), (0, nq_pad - N), (0, 0)))
    kp = jnp.pad(k.reshape(B * H, N, dh), ((0, 0), (0, n_pad - N), (0, 0)))
    vp = jnp.pad(v.reshape(B * H, N, dh), ((0, 0), (0, n_pad - N), (0, 0)))

    grid = (B * H, nq_pad // bq)
    masked = valid < n_pad
    kernel = functools.partial(_attn_kernel, scale=float(scale))
    # Interpret mode lets the same kernel run in CPU tests
    # (tests/conftest.py forces JAX_PLATFORMS=cpu). On real TPU (including
    # the 'axon' tunnel platform) the kernel compiles via Mosaic.
    interpret = jax.default_backend() == "cpu"
    in_specs = [
        pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, dh), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, dh), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qp, kp, vp]
    if masked:
        in_specs.append(pl.BlockSpec((1, n_pad), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_mask_bias(valid, n_pad))
    out = pl.pallas_call(
        kernel,
        out_shape=_sds((B * H, nq_pad, dh), q.dtype, q),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * dh,
            bytes_accessed=(3 * B * H * N * dh + B * H * N * dh)
            * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :N].reshape(B, H, N, dh)


# ---------------------------------------------------------------------------
# Pallas backward kernel
# ---------------------------------------------------------------------------

def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, *refs, scale: float,
                     nq_tiles: int):
    """One (batch*head, q-block) grid cell of the attention backward.

    Recomputes this q-block's softmax row block from q/k (the forward
    saves no probabilities — logits never touch HBM in either direction),
    emits dq for the block, and accumulates this block's dk/dv
    contributions in fp32 VMEM scratch across the sequential q-grid;
    the last block flushes the accumulators to HBM.

    Padded q rows carry zero cotangent (g is zero-padded), so their
    contributions to dk/dv vanish identically; padded k columns are masked
    via the additive bias row (see _attn_kernel), so their p (and thus dl)
    columns are zero.
    """
    if len(refs) == 6:
        bias_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        bias_ref = None
        dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [BQ, N]
    if bias_ref is not None:
        logits = logits + bias_ref[...]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)               # fp32 [BQ, N]
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [BQ, N]
    dl = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))  # fp32 [BQ, N]
    # dl is cast to the input dtype (bf16 on the TPU path) so the dq/dk dots
    # hit the MXU; the pure-XLA backward kept dl fp32, so the bf16 path
    # trades a small precision loss (bounded by test_attention grad-parity
    # tolerances) for MXU throughput.
    dl_c = dl.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        dl_c, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    # dk/dv contributions contract over this q block: [N, dh].
    dk_c = jax.lax.dot_general(
        dl_c, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dv_c = jax.lax.dot_general(
        p.astype(v.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = dk_c
        dv_acc[:] = dv_c

    @pl.when(i > 0)
    def _():
        dk_acc[:] += dk_c
        dv_acc[:] += dv_c

    @pl.when(i == nq_tiles - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pallas_attention_bwd_impl(q, k, v, g, scale: float, n_valid: int = 0):
    B, H, N, dh = q.shape
    valid = n_valid or N
    n_pad = pl.cdiv(N, 128) * 128
    bq, nq_pad = _q_tiling(N, budget=_BWD_LOGITS_VMEM_BUDGET)
    qp = jnp.pad(q.reshape(B * H, N, dh), ((0, 0), (0, nq_pad - N), (0, 0)))
    gp = jnp.pad(g.reshape(B * H, N, dh), ((0, 0), (0, nq_pad - N), (0, 0)))
    kp = jnp.pad(k.reshape(B * H, N, dh), ((0, 0), (0, n_pad - N), (0, 0)))
    vp = jnp.pad(v.reshape(B * H, N, dh), ((0, 0), (0, n_pad - N), (0, 0)))
    nq_tiles = nq_pad // bq
    masked = valid < n_pad
    kernel = functools.partial(_attn_bwd_kernel, scale=float(scale),
                               nq_tiles=nq_tiles)
    interpret = jax.default_backend() == "cpu"
    kv_spec = pl.BlockSpec((1, n_pad, dh), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bq_spec = pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [bq_spec, kv_spec, kv_spec, bq_spec]
    operands = [qp, kp, vp, gp]
    if masked:
        in_specs.append(pl.BlockSpec((1, n_pad), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_mask_bias(valid, n_pad))
    dq_p, dk_p, dv_p = pl.pallas_call(
        kernel,
        out_shape=(_sds((B * H, nq_pad, dh), q.dtype, q),
                   _sds((B * H, n_pad, dh), k.dtype, k),
                   _sds((B * H, n_pad, dh), v.dtype, v)),
        grid=(B * H, nq_tiles),
        in_specs=in_specs,
        out_specs=(bq_spec, kv_spec, kv_spec),
        scratch_shapes=[pltpu.VMEM((n_pad, dh), jnp.float32),
                        pltpu.VMEM((n_pad, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * N * dh,
            bytes_accessed=7 * B * H * N * dh * q.dtype.itemsize,
            transcendentals=B * H * N * N),
        interpret=interpret,
    )(*operands)
    return (dq_p[:, :N].reshape(B, H, N, dh),
            dk_p[:, :N].reshape(B, H, N, dh),
            dv_p[:, :N].reshape(B, H, N, dh))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_attention(q, k, v, scale, n_valid):
    return _pallas_attention_fwd_impl(q, k, v, scale, n_valid)


def _pallas_attention_fwd(q, k, v, scale, n_valid):
    return _pallas_attention_fwd_impl(q, k, v, scale, n_valid), (q, k, v)


def _pallas_attention_bwd(scale, n_valid, res, g):
    q, k, v = res
    return _pallas_attention_bwd_impl(q, k, v, g, scale, n_valid)


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


# ---------------------------------------------------------------------------
# Fused-qkv Pallas kernels: read the raw [B, N, 3D] qkv projection, write
# the pre-proj [B, N, D] attention output
# ---------------------------------------------------------------------------
#
# The split-tensor kernels above take q/k/v as [B, H, N, dh] — the layout
# torch attention materializes. Producing it from the qkv dense's natural
# [B, N, 3D] output costs real data movement per ViT block: 3 splits, a
# [B,N,H,dh]->[B,H,N,dh] transpose per operand, per-operand pads to the
# tile grid, and the inverse transpose on the output (round-4 trace:
# ~1.3 ms/step of copy/pad lines around the attention calls at the
# flagship workload). Here the grid cell indexes straight into the fused
# tensor instead: head PAIR j reads q at lane chunk j, k at chunk C+j, v
# at chunk 2C+j (C = D/128 chunks per section; dh=64 so one 128-lane
# chunk is exactly two heads), and writes its [bq, 128] output slice into
# a [B, N, D] array the proj dense consumes directly. The only data
# movement left is ONE token-axis pad of qkv to a sublane multiple.

# Run the head-pair kernels' K=dh contractions (fwd logits, bwd logits,
# bwd dp) as K=128 dots against the full two-head lane chunk, zeroing the
# OTHER head's 64 lanes of the k/v operand so cross-head terms vanish.
# Probe (scripts/mxu_k_probe.py, v5e): a K=64 dot is overhead-bound and
# costs ~1.4x a K=128 dot in ABSOLUTE time, so two masked K=128 dots beat
# two K=64 dots by ~25% despite doubling the streamed MACs. The W=64
# output dots (PV, dq, dk, dv) measured efficient and stay per-head.
# Ablation knob, measured e2e (PERFORMANCE.md).
PACK_QK_K128 = True


def _lane_half_masks(dh: int, dtype):
    """0/1 [1, 128] masks selecting each dh-lane head of a two-head
    chunk (dh=64 -> lanes [0,64) and [64,128))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return [jnp.logical_and(lane >= h * dh, lane < (h + 1) * dh)
            .astype(dtype) for h in range(128 // dh)]


def _attn_qkv_kernel(q_ref, k_ref, v_ref, *refs, scale: float, dh: int):
    """One (batch, head-pair, q-block) grid cell.

    q_ref: [1, BQ, 128]; k_ref/v_ref: [1, N_pad, 128]; o_ref: [1, BQ, 128].
    The 128-lane chunk holds two dh=64 heads side by side; each computes
    its own softmax (same math as _attn_kernel) and lands in its own
    output lane half."""
    bias_ref, o_ref = (refs if len(refs) == 2 else (None, refs[0]))
    pack = PACK_QK_K128 and 128 % dh == 0 and dh < 128
    if pack:
        q2 = q_ref[0]
        k2 = k_ref[0]
        masks = _lane_half_masks(dh, k2.dtype)
    outs = []
    for h in range(128 // dh):
        v = v_ref[0][:, h * dh:(h + 1) * dh]
        if pack:
            # K=128 dot vs the head-masked chunk: the other head's lanes
            # of k are zero, so only this head's q lanes contribute.
            logits = jax.lax.dot_general(
                q2, k2 * masks[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [BQ, N_pad]
        else:
            q = q_ref[0][:, h * dh:(h + 1) * dh]
            k = k_ref[0][:, h * dh:(h + 1) * dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [BQ, N_pad]
        if bias_ref is not None:
            logits = logits + bias_ref[...]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(o / denom)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _attn_qkv_fwd_impl(qkv, scale: float, n_valid: int, num_heads: int):
    B, N, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    C = D // 128                       # lane chunks per q/k/v section
    valid = n_valid or N
    bq, n_pad = _q_tiling(N, kv_len=pl.cdiv(N, 8) * 8)
    # ONE pad of the fused tensor to the tile grid (the kv length is the
    # same token axis, so kv columns pad to n_pad too — a sublane multiple,
    # not a lane multiple; Mosaic masks the non-128 logits lane remainder).
    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
    masked = valid < n_pad
    kernel = functools.partial(_attn_qkv_kernel, scale=float(scale), dh=dh)
    interpret = jax.default_backend() == "cpu"
    in_specs = [
        pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, 128), lambda b, j, i: (b, 0, C + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, 128), lambda b, j, i: (b, 0, 2 * C + j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qkvp, qkvp, qkvp]
    if masked:
        in_specs.append(pl.BlockSpec((1, n_pad), lambda b, j, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_mask_bias(valid, n_pad))
    out = pl.pallas_call(
        kernel,
        out_shape=_sds((B, n_pad, D), qkv.dtype, qkv),
        grid=(B, C, n_pad // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * N * dh,
            bytes_accessed=4 * B * N * D * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :N]


def _attn_qkv_bwd_kernel(q_ref, k_ref, v_ref, g_ref, *refs, scale: float,
                         dh: int, nq_tiles: int):
    """One (batch, head-pair, q-block) grid cell of the fused backward.

    Same recompute-based math as _attn_bwd_kernel, two heads per cell;
    dk/dv accumulate in fp32 VMEM scratch across the sequential q grid
    and flush on the last block."""
    if len(refs) == 6:
        bias_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        bias_ref = None
        dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    i = pl.program_id(2)
    pack = PACK_QK_K128 and 128 % dh == 0 and dh < 128
    if pack:
        q2 = q_ref[0]
        k2 = k_ref[0]
        v2 = v_ref[0]
        g2 = g_ref[0]
        masks = _lane_half_masks(dh, k2.dtype)
    dqs, dks, dvs = [], [], []
    for h in range(128 // dh):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        g = g_ref[0][:, sl]
        if pack:
            # K=128 dots vs head-masked chunks (see _attn_qkv_kernel):
            # the two K=dh contractions of the backward — the logits
            # recompute and dp — both ride the full two-head chunk.
            logits = jax.lax.dot_general(
                q2, k2 * masks[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        else:
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            logits = logits + bias_ref[...]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)           # fp32 [BQ, N]
        if pack:
            dp = jax.lax.dot_general(
                g2, v2 * masks[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dl = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dl_c = dl.astype(q.dtype)
        dqs.append(jax.lax.dot_general(
            dl_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dks.append(jax.lax.dot_general(
            dl_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dvs.append(jax.lax.dot_general(
            p.astype(v.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_c = jnp.concatenate(dks, axis=1)
    dv_c = jnp.concatenate(dvs, axis=1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = dk_c
        dv_acc[:] = dv_c

    @pl.when(i > 0)
    def _():
        dk_acc[:] += dk_c
        dv_acc[:] += dv_c

    @pl.when(i == nq_tiles - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _attn_qkv_bwd_impl(qkv, g, scale: float, n_valid: int, num_heads: int):
    B, N, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    C = D // 128
    valid = n_valid or N
    bq, n_pad = _q_tiling(N, budget=_BWD_LOGITS_VMEM_BUDGET,
                          kv_len=pl.cdiv(N, 8) * 8)
    # kv rows ride the same token axis as q rows, so the array pads to the
    # q grid; recompute n_pad accordingly (kv_len above is only the budget
    # estimate).
    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad - N), (0, 0)))
    nq_tiles = n_pad // bq
    masked = valid < n_pad
    kernel = functools.partial(_attn_qkv_bwd_kernel, scale=float(scale),
                               dh=dh, nq_tiles=nq_tiles)
    interpret = jax.default_backend() == "cpu"
    bq_spec = pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, j),
                           memory_space=pltpu.VMEM)
    kv_spec_k = pl.BlockSpec((1, n_pad, 128), lambda b, j, i: (b, 0, C + j),
                             memory_space=pltpu.VMEM)
    kv_spec_v = pl.BlockSpec((1, n_pad, 128),
                             lambda b, j, i: (b, 0, 2 * C + j),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, n_pad, 128), lambda b, j, i: (b, 0, j),
                             memory_space=pltpu.VMEM)
    in_specs = [bq_spec, kv_spec_k, kv_spec_v, bq_spec]
    operands = [qkvp, qkvp, qkvp, gp]
    if masked:
        in_specs.append(pl.BlockSpec((1, n_pad), lambda b, j, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_mask_bias(valid, n_pad))
    dq_p, dk_p, dv_p = pl.pallas_call(
        kernel,
        out_shape=(_sds((B, n_pad, D), qkv.dtype, qkv),
                   _sds((B, n_pad, D), qkv.dtype, qkv),
                   _sds((B, n_pad, D), qkv.dtype, qkv)),
        grid=(B, C, nq_tiles),
        in_specs=in_specs,
        out_specs=(bq_spec, full_spec, full_spec),
        scratch_shapes=[pltpu.VMEM((n_pad, 128), jnp.float32),
                        pltpu.VMEM((n_pad, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * N * N * dh,
            bytes_accessed=8 * B * N * D * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N),
        interpret=interpret,
    )(*operands)
    return jnp.concatenate(
        [dq_p[:, :N], dk_p[:, :N], dv_p[:, :N]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pallas_attention_qkv(qkv, scale, n_valid, num_heads):
    return _attn_qkv_fwd_impl(qkv, scale, n_valid, num_heads)


def _pallas_attention_qkv_fwd(qkv, scale, n_valid, num_heads):
    return _attn_qkv_fwd_impl(qkv, scale, n_valid, num_heads), qkv


def _pallas_attention_qkv_bwd(scale, n_valid, num_heads, qkv, g):
    return (_attn_qkv_bwd_impl(qkv, g, scale, n_valid, num_heads),)


_pallas_attention_qkv.defvjp(_pallas_attention_qkv_fwd,
                             _pallas_attention_qkv_bwd)


# Measured VMEM bound for the fused-qkv backward on v5e: two heads per
# grid cell keep both heads' [bq, n_pad] fp32 intermediates live, so the
# per-cell footprint is ~2x the split-tensor kernel's. n_pad=2048 compiles
# and runs (value+grad, real chip); 3672 overflows the 16 MB scoped-vmem
# stack (23.3 MB). Longer sequences (480px loss resolution, ~3.6k tokens)
# fall back to the split-tensor kernels, whose own tiling handles them.
_QKV_MAX_N_PAD = 2048


def _mosaic_backend() -> bool:
    """True when Pallas kernels compile via Mosaic (any non-CPU backend);
    False in the CPU interpret mode tests and the virtual-mesh dryrun use."""
    return jax.default_backend() != "cpu"


def _kernel_dtype_ok(dtype) -> bool:
    """The kernels are bf16-by-design: every VMEM budget (_LOGITS_VMEM_
    BUDGET, _BWD_LOGITS_VMEM_BUDGET, the fused-qkv two-head footprint) is
    sized for bf16 operands. fp32 operands double the live tiles and spill
    the Mosaic VMEM allocation — measured on the fp32 inversion path
    (tools/inversion.py, N=981): 1.49 iters/s with the kernels vs 9.69
    with XLA attention, a 6.5x e2e loss. On Mosaic backends fp32 therefore
    routes to the XLA path; in CPU interpret mode (tests, dryrun) any
    dtype exercises the kernel logic."""
    return dtype == jnp.bfloat16 or not _mosaic_backend()


def qkv_attention_supported(qkv, num_heads: int) -> bool:
    B, N, threeD = qkv.shape
    D = threeD // 3
    if D % num_heads or D // num_heads != 64 or D % 128:
        return False                   # exactly two dh=64 heads per chunk
    if not _kernel_dtype_ok(qkv.dtype):
        return False
    return pl.cdiv(N, 8) * 8 <= _QKV_MAX_N_PAD


def attention_from_qkv(qkv, num_heads: int, scale: float,
                       use_pallas: bool = False,
                       n_valid: int = 0) -> jax.Array:
    """Multi-head attention straight from the fused qkv projection.

    qkv: [B, N, 3D] laid out q|k|v-major with heads contiguous inside each
    section (the DINO qkv dense layout, reference extractor.py:139-144).
    Returns the pre-proj attention output [B, N, D] — head-concatenated,
    exactly what the proj dense consumes. On the Pallas path neither the
    per-head [B,H,N,dh] tensors nor their layout transposes ever
    materialize; the fallback reproduces the split-tensor path bit-for-bit.
    """
    B, N, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    if use_pallas and qkv_attention_supported(qkv, num_heads):
        return _pallas_attention_qkv(qkv, float(scale), int(n_valid),
                                     num_heads)
    q, k, v = [t.reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, axis=-1)]
    o = multi_head_attention(q, k, v, scale, use_pallas=use_pallas,
                             n_valid=n_valid)
    return o.transpose(0, 2, 1, 3).reshape(B, N, D)


def pallas_attention_supported(q) -> bool:
    B, H, N, dh = q.shape
    if dh % 64 != 0:
        return False
    if not _kernel_dtype_ok(q.dtype):
        return False
    return pl.cdiv(N, 128) * 128 <= _MAX_N_PAD


def multi_head_attention(q, k, v, scale: float,
                         use_pallas: bool = False,
                         n_valid: int = 0) -> jax.Array:
    """Softmax attention over [B, H, N, dh] tensors.

    `use_pallas` routes through the fused TPU kernel when the shape qualifies;
    both paths are differentiable and numerically equivalent (fp32 softmax).

    n_valid > 0 marks tokens [n_valid:] of the key/value axis as padding to
    be masked out of the softmax — the padded-token-stream contract
    (vit_forward pads the token axis to a lane multiple ONCE at embedding,
    instead of every kernel call padding and re-slicing; query rows beyond
    n_valid produce garbage that stays in their own rows and is sliced away
    at tap extraction). 0 means every token is valid.
    """
    if use_pallas and pallas_attention_supported(q):
        return _pallas_attention(q, k, v, float(scale), int(n_valid))
    return _xla_attention(q, k, v, scale,
                          n_valid=int(n_valid) if n_valid else None)
