"""TPU-native DINO/DINOv2 Vision Transformer with first-class feature taps.

Replaces the reference's hook-spied torch.hub backbone (reference
models/extractor.py:20,31-103 registers 48 forward hooks per extraction call,
collects 4x12 tensors and throws most away). Here the ViT is a pure function
that *returns* exactly the features a caller asks for — qkv projections, block
outputs, attention probabilities — as part of its output pytree, so the whole
thing stays inside one jitted/differentiated graph.

Architecture (ViT-S/B patch 8/16, facebookresearch/dino layout; ViT-L/14 for
DINOv2 with LayerScale): patch-embed conv -> [CLS] prepend -> interpolated
position embeddings -> pre-LN transformer blocks -> (optional) final LN.
Weights load from a ported .npz (tools/port_dino_weights.py) or deterministic
random init.

Params are plain nested dicts (pytrees): trivially shardable with
jax.sharding (see splice_tpu/parallel/) and fully transparent to jit/grad.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import ad_checkpoint

from splice_tpu.ops import attention as attn_ops


@dataclasses.dataclass(frozen=True)
class VitConfig:
    patch_size: int = 8
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    img_size: int = 224                 # grid the stored pos_embed was trained at
    # DINO interpolates pos embeds with a +0.1 grid offset (upstream
    # vision_transformer.py interpolate_pos_encoding); DINOv2 uses 0.
    interpolate_offset: float = 0.1
    layerscale_init: Optional[float] = None   # DINOv2: 1e-5; DINO: None
    num_register_tokens: int = 0              # DINOv2-reg variants

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def base_grid(self) -> int:
        return self.img_size // self.patch_size


# Registry mirroring the reference's allowed model names
# (reference conf/default/config.yaml:25) plus DINOv2 (BASELINE.json config 5).
VIT_CONFIGS: Dict[str, VitConfig] = {
    "dino_vitb8": VitConfig(patch_size=8, embed_dim=768, depth=12, num_heads=12),
    "dino_vits8": VitConfig(patch_size=8, embed_dim=384, depth=12, num_heads=6),
    "dino_vitb16": VitConfig(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "dino_vits16": VitConfig(patch_size=16, embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": VitConfig(patch_size=14, embed_dim=768, depth=12,
                               num_heads=12, img_size=518,
                               interpolate_offset=0.0, layerscale_init=1e-5),
    "dinov2_vitl14": VitConfig(patch_size=14, embed_dim=1024, depth=24,
                               num_heads=16, img_size=518,
                               interpolate_offset=0.0, layerscale_init=1e-5),
    # DINOv2-with-registers variants (4 register tokens inserted after the
    # pos-add, upstream dinov2_vit{b,l}14_reg).
    "dinov2_vitb14_reg": VitConfig(patch_size=14, embed_dim=768, depth=12,
                                   num_heads=12, img_size=518,
                                   interpolate_offset=0.0,
                                   layerscale_init=1e-5,
                                   num_register_tokens=4),
    "dinov2_vitl14_reg": VitConfig(patch_size=14, embed_dim=1024, depth=24,
                                   num_heads=16, img_size=518,
                                   interpolate_offset=0.0,
                                   layerscale_init=1e-5,
                                   num_register_tokens=4),
}


def get_vit_config(model_name: str) -> VitConfig:
    if model_name not in VIT_CONFIGS:
        raise ValueError(f"unknown ViT model {model_name!r}; "
                         f"known: {sorted(VIT_CONFIGS)}")
    return VIT_CONFIGS[model_name]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_vit_params(key: jax.Array, cfg: VitConfig,
                    dtype=jnp.float32) -> Dict[str, Any]:
    """Deterministic random init (trunc-normal-ish). Real feature quality
    comes from ported DINO weights; this keeps the framework runnable with
    zero network access."""
    D, P = cfg.embed_dim, cfg.patch_size
    H = int(cfg.mlp_ratio * D)
    # Upstream DINOv2-reg stores pos_embed for cls + patches ONLY:
    # register tokens are inserted after the pos-add and carry no
    # positional embedding (dinov2 vision_transformer.py
    # prepare_tokens_with_masks).
    n_pos = 1 + cfg.base_grid ** 2
    keys = jax.random.split(key, 4 + cfg.depth)

    def tn(k, shape, std=0.02):
        return (std * jax.random.truncated_normal(k, -2.0, 2.0, shape)
                ).astype(dtype)

    params: Dict[str, Any] = {
        "cls_token": tn(keys[0], (1, 1, D)),
        "pos_embed": tn(keys[1], (1, n_pos, D)),
        "patch_embed": {
            "kernel": tn(keys[2], (P, P, 3, D)),
            "bias": jnp.zeros((D,), dtype),
        },
        "norm": {"scale": jnp.ones((D,), dtype),
                 "bias": jnp.zeros((D,), dtype)},
        "blocks": [],
    }
    if cfg.num_register_tokens:
        params["register_tokens"] = tn(keys[3],
                                       (1, cfg.num_register_tokens, D))
    for i in range(cfg.depth):
        bk = jax.random.split(keys[4 + i], 4)
        blk = {
            "norm1": {"scale": jnp.ones((D,), dtype),
                      "bias": jnp.zeros((D,), dtype)},
            "attn": {
                "qkv": {"kernel": tn(bk[0], (D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), dtype)},
                "proj": {"kernel": tn(bk[1], (D, D)),
                         "bias": jnp.zeros((D,), dtype)},
            },
            "norm2": {"scale": jnp.ones((D,), dtype),
                      "bias": jnp.zeros((D,), dtype)},
            "mlp": {
                "fc1": {"kernel": tn(bk[2], (D, H)),
                        "bias": jnp.zeros((H,), dtype)},
                "fc2": {"kernel": tn(bk[3], (H, D)),
                        "bias": jnp.zeros((D,), dtype)},
            },
        }
        if cfg.layerscale_init is not None:
            blk["ls1"] = jnp.full((D,), cfg.layerscale_init, dtype)
            blk["ls2"] = jnp.full((D,), cfg.layerscale_init, dtype)
        params["blocks"].append(blk)
    return params


def cast_params_for_compute(params: Dict[str, Any], compute_dtype
                            ) -> Dict[str, Any]:
    """Store the large frozen weights directly in the compute dtype.

    With bf16 compute, fp32-stored dense kernels cost double: the block
    scan slices 28 MB/block of fp32 weights per forward and then converts
    each slice to bf16 at every use (profiled at ~2 ms/step, round-3 trace:
    vit.py dot_general feed lines). The weights are frozen — there is no
    optimizer needing an fp32 master copy — so storing the matmul operands
    in bf16 halves that traffic and deletes the converts. Small/sensitive
    tensors (LayerNorm affine, pos_embed used by fp32 interpolation,
    cls/register tokens, LayerScale) stay fp32: they are cast to fp32 at
    use anyway (_layer_norm) or feed fp32 math (interpolate_pos_embed).
    """
    if compute_dtype == jnp.float32:
        return params
    out = dict(params)
    out["patch_embed"] = jax.tree.map(
        lambda t: t.astype(compute_dtype), params["patch_embed"])
    out["blocks"] = [
        {**blk,
         "attn": jax.tree.map(lambda t: t.astype(compute_dtype),
                              blk["attn"]),
         "mlp": jax.tree.map(lambda t: t.astype(compute_dtype),
                             blk["mlp"])}
        for blk in params["blocks"]
    ]
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

# HIGHEST = exact for the operand dtype. bf16 operands still ride the MXU at
# full rate with fp32 accumulation; fp32 operands are not silently truncated
# (JAX's DEFAULT matmul precision is lossy, even on CPU).
_HI = jax.lax.Precision.HIGHEST
# Pad the token axis to a lane multiple once at embedding instead of per
# attention call. Measured e2e-negative at the training shapes (see the
# note in vit_forward); kept as an ablation knob — the n_valid masking
# machinery it drives is unit-tested either way (test_attention.py::
# TestPaddedTokenStream).
PAD_TOKEN_STREAM = False
# Save LayerNorm VJP intermediates under remat instead of re-running the
# LN reductions in the backward; see _layer_norm. Modes: False (full LN
# recompute), "inv" ([B,N,1] inverse std only), "mean" ([B,N,1] mean +
# inv — all reductions saved, centered input rebuilt elementwise), True
# (centered input + inv: the f32 [B,N,D] saves cost ~230 MB/step of
# remat-stack traffic). Ablation knob, measured e2e (PERFORMANCE.md).
SAVE_LN_STATS = "mean"
# Unroll factor for the pre-tap block scan (ablate.py `bu<N>`); unroll=2
# measured 30.65 vs 31.96 steps/s (PERFORMANCE.md negative results).
BLOCK_SCAN_UNROLL = 1


def _dense(x, p):
    """x @ kernel + bias at HIGHEST precision (f32 MXU accumulation
    internally; no preferred_element_type so the VJP sees uniform dtypes
    in bf16 mode)."""
    y = jax.lax.dot_general(
        x, p["kernel"].astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        precision=_HI)
    return y + p["bias"].astype(y.dtype)


def _dense_rowparallel(x, p, axis: str):
    """Row-parallel dense for manual tensor parallelism: the kernel's INPUT
    dim is sharded over `axis`, so the local dot yields a partial sum;
    psum completes it, and the (replicated) bias is added once, after."""
    y = jax.lax.dot_general(
        x, p["kernel"].astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        precision=_HI)
    y = jax.lax.psum(y, axis)
    return y + p["bias"].astype(y.dtype)


def _tp_allcat(local: jax.Array, shard_axis: int, tp: int, axis: str
               ) -> jax.Array:
    """Concatenate per-shard slices along `shard_axis` across the manual
    mesh axis `axis`, as an INVARIANT output: each shard embeds its slice
    into zeros at its slot and a psum assembles the full array. psum (not
    all_gather) because its output is invariant over `axis` under VMA
    tracking — everything computed from the gathered taps (losses, grads)
    then stays invariant, which the enclosing shard_map's replicated
    out_specs require."""
    idx = jax.lax.axis_index(axis)
    shape = list(local.shape)
    shape[shard_axis] = shape[shard_axis] * tp
    full = jnp.zeros(shape, local.dtype)
    start = [jnp.int32(0)] * len(shape)
    start[shard_axis] = idx * local.shape[shard_axis]
    full = jax.lax.dynamic_update_slice(full, local, start)
    return jax.lax.psum(full, axis)


def _tp_gather_qkv(qkv_local: jax.Array, cfg: "VitConfig", axis: str
                   ) -> jax.Array:
    """Reassemble the full [B, N, 3D] qkv tap from per-shard local slices.

    Manual-tp params are column-permuted shard-major (mesh.py
    manual_tp_permute_vit_params), so the local slice is [q_l | k_l | v_l]
    over the shard's own heads. Regrouping: [B,N,3,Hl,dh] concat over
    shards on the head axis gives global head order, then q|k|v-major
    reshape restores the reference layout (reference extractor.py:139-144
    consumers index it as [N, 3, H, dh])."""
    B, N, threeDl = qkv_local.shape
    dh = cfg.head_dim
    hl = threeDl // 3 // dh
    tp = cfg.num_heads // hl
    local = qkv_local.reshape(B, N, 3, hl, dh)
    full = _tp_allcat(local, 3, tp, axis)           # [B,N,3,H,dh] head-major
    # [B,N,3,H,dh] -> [B,N,3D] is a plain reshape: q|k|v major, heads within
    return full.reshape(B, N, 3 * cfg.embed_dim)


def _layer_norm(x, p, eps, save_stats: bool = False):
    """Pre-affine LayerNorm in fp32.

    save_stats names the centered input and inverse-std so the remat
    policy can keep them: LayerNorm's VJP references exactly these two
    intermediates, and without them the backward re-runs the mean/var
    reductions from the (policy-saved) block input for every LN of every
    block — measured ~2.4 ms/step of the frozen-ViT backward at the
    training shapes (add/reduce fusions in the round-3 trace)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    if save_stats == "mean":
        # Saving the [B,N,1] mean (not the [B,N,D] centered input) lets
        # the backward rebuild `sub` with ONE elementwise subtract from
        # the policy-saved block input — no reduction re-run AND ~768x
        # less remat-stack traffic than naming `sub` itself (the two f32
        # sub stacks were ~230 MB/step of HBM writes+reads in the round-4
        # trace).
        mean = ad_checkpoint.checkpoint_name(mean, "vit_ln_mean")
    sub = x32 - mean
    var = jnp.mean(jnp.square(sub), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if save_stats:
        if save_stats not in ("inv", "mean"):
            sub = ad_checkpoint.checkpoint_name(sub, "vit_ln_sub")
        inv = ad_checkpoint.checkpoint_name(inv, "vit_ln_inv")
    y = sub * inv
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _bicubic_resize_matrix(in_size: int, out_size: int, scale: float,
                           a: float = -0.75) -> np.ndarray:
    """[out, in] interpolation weights replicating torch bicubic upsampling
    (cubic convolution with a=-0.75, half-pixel centers, replicate borders).
    jax.image's cubic is the Keys a=-0.5 kernel, which does NOT match torch —
    and DINO's checkpointed features depend on torch's kernel.
    src coordinate for output i: (i + 0.5)/scale - 0.5 (the scale_factor
    convention DINO passes to F.interpolate)."""
    def k(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0
        if x < 2.0:
            return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a
        return 0.0

    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        s = (i + 0.5) / scale - 0.5
        i0 = int(np.floor(s))
        t = s - i0
        for m, wgt in zip(range(i0 - 1, i0 + 3),
                          (k(1.0 + t), k(t), k(1.0 - t), k(2.0 - t))):
            W[i, min(max(m, 0), in_size - 1)] += wgt
    return W.astype(np.float32)


def interpolate_pos_embed(pos_embed: jax.Array, cfg: VitConfig,
                          gh: int, gw: int) -> jax.Array:
    """Bicubic pos-embed interpolation to a (gh, gw) patch grid, including
    DINO's +0.1 offset trick (upstream dino vision_transformer.py
    interpolate_pos_encoding). pos_embed covers cls + patches only
    (register tokens carry no positional embedding upstream).
    Returns [1, 1+gh*gw, D]."""
    prefix, patch = pos_embed[:, :1], pos_embed[:, 1:]
    g0 = cfg.base_grid
    if (gh, gw) == (g0, g0):
        return pos_embed
    D = pos_embed.shape[-1]
    patch = patch.reshape(g0, g0, D).astype(jnp.float32)
    # DINO rescales by (g + offset)/g0 rather than exactly g/g0 (offset 0.1);
    # DINOv2 uses the exact ratio. Both resolve to static weight matrices —
    # the target grid is static under jit — applied as two small matmuls.
    sy = (gh + cfg.interpolate_offset) / g0
    sx = (gw + cfg.interpolate_offset) / g0
    Wy = jnp.asarray(_bicubic_resize_matrix(g0, gh, sy))
    Wx = jnp.asarray(_bicubic_resize_matrix(g0, gw, sx))
    out = jnp.einsum("oi,iwd->owd", Wy, patch, precision=_HI)
    out = jnp.einsum("oj,hjd->hod", Wx, out, precision=_HI)
    out = out.reshape(1, gh * gw, D).astype(pos_embed.dtype)
    return jnp.concatenate([prefix, out], axis=1)


def _block(x, bp, cfg: VitConfig, use_pallas: bool, want,
           tp_axis: Optional[str] = None, tp_manual: Optional[str] = None,
           n_valid: int = 0):
    """One pre-LN transformer block. Returns (x_out, taps dict).

    n_valid > 0 means the token axis is pre-padded to a lane multiple
    (vit_forward pads ONCE at embedding): attention masks keys beyond
    n_valid, and every tap is sliced back to the valid tokens here so
    consumers never see padding. Padded rows carry garbage that stays in
    its own rows (attention is row-wise and masked) and exactly-zero
    cotangents (nothing downstream reads them).

    tp_axis: mesh axis name for Megatron-style tensor parallelism in a
    GSPMD-auto region — heads sharded in attention, hidden dim sharded in
    the MLP; XLA inserts the row-parallel all-reduces after proj/fc2.

    tp_manual: mesh axis name for MANUAL tensor parallelism inside a
    fully-manual shard_map region (Pallas kernels cannot sit in GSPMD-auto
    regions, so tp_axis would force the XLA attention fallback — this path
    keeps the custom kernels; round-2 VERDICT next #4). Params must be the
    column-permuted local slices (mesh.py manual_tp_permute_vit_params +
    vit_param_pspecs): the block computes its local heads / local MLP
    hidden and explicitly psums after proj and fc2.
    """
    from jax.sharding import PartitionSpec as P

    def tp(t, spec):
        if tp_axis is None:
            return t
        return jax.lax.with_sharding_constraint(t, P(*spec))

    def unpad(t):
        return t[:, :n_valid] if n_valid else t

    taps = {}
    h = _layer_norm(x, bp["norm1"], cfg.ln_eps, save_stats=SAVE_LN_STATS)
    qkv = _dense(h, bp["attn"]["qkv"])              # [B, N, 3*D/tp] local
    if "qkv" in want:
        taps["qkv"] = unpad(_tp_gather_qkv(qkv, cfg, tp_manual)
                            if tp_manual else qkv)
    B, N, _ = qkv.shape
    dh = cfg.head_dim
    Hn = qkv.shape[-1] // 3 // dh     # local head count under manual tp
    scale = dh ** -0.5
    if "attn_probs" in want:
        # Materialize probabilities only when explicitly requested (the
        # reference's ATTN tap, extractor.py:44); slow path.
        q, k, v = [t.reshape(B, N, Hn, dh).transpose(0, 2, 1, 3)
                   for t in jnp.split(qkv, 3, axis=-1)]          # [B,H,N,dh]
        if tp_axis is not None:
            q, k, v = [tp(t, (None, tp_axis, None, None)) for t in (q, k, v)]
        logits = (q.astype(jnp.float32) @
                  k.astype(jnp.float32).transpose(0, 1, 3, 2)) * scale
        if n_valid:
            logits = logits + attn_ops._pad_mask_bias(n_valid, N)
        probs = jax.nn.softmax(logits, axis=-1)            # local heads
        o = (probs @ v.astype(jnp.float32)).astype(x.dtype)
        if tp_manual:
            probs = _tp_allcat(probs, 1, cfg.num_heads // Hn, tp_manual)
        # masked pad columns carry ~0 probability, so valid rows already
        # normalize over valid columns; slicing loses nothing.
        taps["attn_probs"] = (probs[:, :, :n_valid, :n_valid]
                              if n_valid else probs)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, Hn * dh)
    elif tp_axis is not None:
        # GSPMD-auto tp: keep the per-head tensors so heads can carry an
        # explicit sharding constraint (the fused-qkv kernel never
        # materializes them).
        q, k, v = [tp(t.reshape(B, N, Hn, dh).transpose(0, 2, 1, 3),
                      (None, tp_axis, None, None))
                   for t in jnp.split(qkv, 3, axis=-1)]
        o = attn_ops.multi_head_attention(q, k, v, scale,
                                          use_pallas=use_pallas,
                                          n_valid=n_valid)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, Hn * dh)
    else:
        # Hot path: attention straight from the fused qkv tensor — no
        # per-head split/transpose/pad traffic (attention_from_qkv falls
        # back to the split-tensor path when the shape doesn't qualify).
        o = attn_ops.attention_from_qkv(qkv, Hn, scale,
                                        use_pallas=use_pallas,
                                        n_valid=n_valid)
    if tp_manual:
        o = _dense_rowparallel(o, bp["attn"]["proj"], tp_manual)
    else:
        o = _dense(o, bp["attn"]["proj"])
    if "attn_out" in want:
        taps["attn_out"] = unpad(o)                               # PATCH_IMD tap
    if "ls1" in bp:
        o = o * bp["ls1"].astype(o.dtype)
    x = x + o
    h = _layer_norm(x, bp["norm2"], cfg.ln_eps, save_stats=SAVE_LN_STATS)
    h = tp(_dense(h, bp["mlp"]["fc1"]), (None, None, tp_axis))
    h = jax.nn.gelu(h, approximate=False)
    if tp_manual:
        h = _dense_rowparallel(h, bp["mlp"]["fc2"], tp_manual)
    else:
        h = _dense(h, bp["mlp"]["fc2"])
    if "ls2" in bp:
        h = h * bp["ls2"].astype(h.dtype)
    x = x + h
    # Name the block output so the remat policy can save it: LN1-of-next-
    # block's backward needs its input, and without a saved block output the
    # whole block forward (incl. the attention kernel) re-runs in the
    # backward just to rebuild it. Saving [B,N,D] per block (~4.6 MB bf16 at
    # the training shapes) deletes that recompute; everything else the
    # frozen-weights backward needs derives from policy-saved dot outputs.
    x = ad_checkpoint.checkpoint_name(x, "vit_block_out")
    if "block" in want:
        taps["block"] = unpad(x)
    return x, taps


def vit_forward(params: Dict[str, Any], images: jax.Array, cfg: VitConfig,
                taps: Dict[str, Sequence[int]],
                compute_dtype=jnp.float32,
                use_pallas: bool = False,
                remat: bool = False,
                final_norm: bool = False,
                tp_axis: Optional[str] = None,
                tp_manual: Optional[str] = None
                ) -> Dict[str, Dict[int, jax.Array]]:
    """Run the frozen ViT and return the requested feature taps.

    images: [B, H, W, 3], ImageNet-normalized NHWC.
    taps: e.g. {"qkv": [11], "block": [11]}. Tap kinds: "qkv" [B,N,3D] (the
      reference's QKV hook, extractor.py:46), "block" [B,N,D] (BLOCK hook,
      extractor.py:42 — pre-final-norm, exactly like the reference),
      "attn_out" [B,N,D], "attn_probs" [B,H,N,N].
    final_norm: additionally return {"final": {-1: LN(x)}} (DINO's trunk
      output; not used by the splice losses, which read raw block outputs).
    """
    B, H, W, _ = images.shape
    P = cfg.patch_size
    gh, gw = H // P, W // P
    # No preferred_element_type here: a f32-accumulated output would make
    # the conv's transpose (grad flows into `images`) see mixed dtypes in
    # bf16 mode. HIGHEST precision already gives exact bf16xbf16->f32 MXU
    # accumulation before the rounding to compute_dtype.
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        params["patch_embed"]["kernel"].astype(compute_dtype),
        (P, P), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_HI,
    )
    x = x + params["patch_embed"]["bias"].astype(compute_dtype)
    x = x.reshape(B, gh * gw, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype),
                           (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], cfg, gh, gw)
    x = x + pos.astype(compute_dtype)
    if cfg.num_register_tokens:
        # Registers sit between cls and patches and get NO pos embedding
        # (upstream dinov2 prepare_tokens_with_masks inserts them after
        # the pos-add).
        reg = jnp.broadcast_to(
            params["register_tokens"].astype(compute_dtype),
            (B, cfg.num_register_tokens, cfg.embed_dim))
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    # Padded token stream (ablation knob, default OFF): pad the token axis
    # to a lane multiple ONCE here instead of every attention call padding
    # q/k/v and re-slicing the output. Measured e2e NEGATIVE at the
    # training shapes (28.6 vs 29.0 steps/s, round 3): XLA already fuses
    # the per-call pads into the producing dense's output buffer, so the
    # once-padded stream only adds ~2% garbage-row FLOPs to every ViT dot
    # and elementwise pass. Attention masks keys beyond n_valid; taps are
    # sliced back inside _block; padded rows never influence valid rows
    # and carry exactly-zero cotangents.
    n_valid = 0
    n_tokens = x.shape[1]
    # Pad target: the fused-qkv kernel path (dh=64, D % 128 == 0) only
    # needs a SUBLANE multiple (the kv axis pads to the q grid), so
    # 785 -> 792 (+0.9% rows) instead of the split-tensor kernels'
    # 128-lane multiple 896 (+14% dense work in every LN/dense op — why
    # this knob measured e2e-negative in round 3). The %8 relaxation
    # applies ONLY on the fused path; the split-tensor path keeps the
    # round-3 %128 gate so the knob's measured meaning is unchanged.
    fused_qkv_path = cfg.head_dim == 64 and cfg.embed_dim % 128 == 0
    pad_to = (-(-n_tokens // 8) * 8 if fused_qkv_path
              else -(-n_tokens // 128) * 128)
    if (PAD_TOKEN_STREAM and use_pallas and pad_to != n_tokens
            and cfg.head_dim % 64 == 0
            and -(-n_tokens // 128) * 128 <= attn_ops._MAX_N_PAD):
        x = jnp.pad(x, ((0, 0), (0, pad_to - n_tokens), (0, 0)))
        n_valid = n_tokens

    max_layer = max((max(v) for v in taps.values() if len(v)),
                    default=cfg.depth - 1)
    if final_norm:
        max_layer = cfg.depth - 1

    out: Dict[str, Dict[int, jax.Array]] = {k: {} for k in taps}
    block_fn = _block
    if remat:
        # Save matmul outputs, recompute only cheap elementwise/layernorm:
        # full remat re-runs every block matmul in the backward (~25% of
        # ViT time); dots-saveable keeps the FLOP-heavy results while still
        # dropping the big intermediate activations.
        names = ("vit_block_out",)
        if SAVE_LN_STATS == "inv":
            # Save only the [B,N,1] inverse std (~6 KB/block): kills the
            # backward's var reduction + rsqrt recompute, keeps the cheap
            # centered-input recompute.
            names += ("vit_ln_inv",)
        elif SAVE_LN_STATS == "mean":
            # [B,N,1] mean + inverse std: every LN reduction is saved and
            # the centered input is rebuilt with one elementwise subtract
            # — the reduction-free backward of the `sub` mode at ~1/768th
            # of its remat-stack traffic.
            names += ("vit_ln_mean", "vit_ln_inv")
        elif SAVE_LN_STATS:
            # ~19 MB/block extra residuals (fp32 centered input x2 +
            # inv-std) buy back the backward's LN re-reductions.
            names += ("vit_ln_sub", "vit_ln_inv")
        block_fn = jax.checkpoint(
            _block, static_argnums=(2, 3, 4, 5, 6, 7),
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(*names)))

    # Layers before the first tap are identical untapped blocks: run them as
    # ONE lax.scan over stacked params instead of unrolling. This cuts the
    # emitted HLO ~depth-fold (12 unrolled ViT-B blocks x fwd/bwd x several
    # call sites otherwise exceed the TPU tunnel's program upload limit) and
    # compiles much faster; the training path taps only layer 11, so 11 of
    # 12 blocks ride the scan.
    first_tap = min((min(v) for v in taps.values() if len(v)),
                    default=max_layer + 1)
    start = 0
    if first_tap >= 2:
        n_scan = first_tap
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *params["blocks"][:n_scan])

        def scan_body(h, bp):
            h, _ = block_fn(h, bp, cfg, use_pallas, (), tp_axis, tp_manual,
                            n_valid)
            return h, None

        x, _ = jax.lax.scan(scan_body, x, stacked,
                            unroll=BLOCK_SCAN_UNROLL)
        start = n_scan
    for i in range(start, max_layer + 1):
        want = tuple(sorted(k for k, layers in taps.items() if i in layers))
        x, btaps = block_fn(x, params["blocks"][i], cfg, use_pallas, want,
                            tp_axis, tp_manual, n_valid)
        for k, v in btaps.items():
            out[k][i] = v
    if final_norm:
        if n_valid:
            x = x[:, :n_valid]
        out["final"] = {-1: _layer_norm(x, params["norm"], cfg.ln_eps)}
    return out


def vit_apply(params, images, cfg, **kw):
    """Convenience alias."""
    return vit_forward(params, images, cfg, **kw)
