"""DIP-style skip U-Net generator, TPU-native (NHWC, functional, stateless).

Capability-parity with the reference generator (reference models/unet/skip.py
:4-102, common.py:11-124, downsampler.py:5-135, networks.py:24-58): same
topology — per scale a 1x1 skip branch and a stride-2 down branch, recursive
deeper stack, bilinear x2 upsample, center-crop concat, BatchNorm everywhere,
LeakyReLU(0.2), optional extra 1x1 up-conv, final 1x1 conv + Sigmoid — but
built as a pure function over an explicit param pytree instead of
monkey-patched nested nn.Sequential (reference common.py:6-9).

BatchNorm note: the reference only ever runs the generator in train mode
(never calls .eval(); even the logging forward at train.py:72-73 uses batch
stats), so running statistics are dead state. We therefore implement BN as a
stateless normalize-by-current-batch-stats op — no mutable state, which is
exactly what jit/vmap want (SURVEY.md §2 parity checklist, BatchNorm item).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SkipConfig:
    """Mirrors the reference `skip()` signature (reference skip.py:4-15)."""
    num_input_channels: int = 3
    num_output_channels: int = 3
    channels_down: Tuple[int, ...] = (16, 32, 64, 128, 128)
    channels_up: Tuple[int, ...] = (16, 32, 64, 128, 128)
    channels_skip: Tuple[int, ...] = (4, 4, 4, 4, 4)
    filter_size_down: Union[int, Tuple[int, ...]] = 3
    filter_size_up: Union[int, Tuple[int, ...]] = 3
    filter_skip_size: int = 1
    need_sigmoid: bool = True
    need_tanh: bool = False
    need_bias: bool = True
    pad: str = "zero"               # zero | reflection
    upsample_mode: str = "bilinear"  # nearest | bilinear
    downsample_mode: str = "stride"  # stride | avg | max | lanczos2 | lanczos3
    act_fun: str = "LeakyReLU"       # LeakyReLU | Swish | ELU | none
    need1x1_up: bool = True

    def __post_init__(self):
        assert len(self.channels_down) == len(self.channels_up) \
            == len(self.channels_skip)

    @property
    def n_scales(self) -> int:
        return len(self.channels_down)

    def fdown(self, i: int) -> int:
        f = self.filter_size_down
        return f[i] if isinstance(f, (tuple, list)) else f

    def fup(self, i: int) -> int:
        f = self.filter_size_up
        return f[i] if isinstance(f, (tuple, list)) else f


# The reference's 6-scale reflection-pad variant used by the inversion tool
# (reference inversion.py:21-25).
def inversion_skip_config(input_depth: int = 32) -> SkipConfig:
    return SkipConfig(
        num_input_channels=input_depth,
        channels_down=(16, 32, 64, 128, 128, 128),
        channels_up=(16, 32, 64, 128, 128, 128),
        channels_skip=(4, 4, 4, 4, 4, 4),
        filter_size_down=(7, 7, 5, 5, 3, 3),
        filter_size_up=(7, 7, 5, 5, 3, 3),
        pad="reflection")


# ---------------------------------------------------------------------------
# Building blocks (reference models/unet/common.py)
# ---------------------------------------------------------------------------

def act(x: jax.Array, act_fun: str) -> jax.Array:
    """reference common.py:76-92."""
    if act_fun == "LeakyReLU":
        return jax.nn.leaky_relu(x, 0.2)
    if act_fun == "Swish":
        return x * jax.nn.sigmoid(x)
    if act_fun == "ELU":
        return jax.nn.elu(x)
    if act_fun == "none":
        return x
    raise ValueError(act_fun)


def batch_norm(x: jax.Array, p: Dict[str, jax.Array],
               eps: float = 1e-5) -> jax.Array:
    """Train-mode BatchNorm2d over (N, H, W), biased variance, per-channel
    affine (torch semantics, reference common.py:95-96). x: [B, H, W, C].

    Statistics accumulate in fp32 (reduction dtype), but the full-resolution
    activation is never materialized in fp32: normalization folds into one
    elementwise pass in the input dtype, y = x*scale' + shift' with
    per-channel fp32 scalars. In bf16 mode this halves the HBM traffic of
    every BN and removes the convert ops around it."""
    mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
    # deviation form (not E[x^2]-m^2): robust to bf16 cancellation when
    # std << mean; the subtraction fuses into the reduction.
    dev = x - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(dev), axis=(0, 1, 2), dtype=jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * inv
    return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def conv2d(x: jax.Array, p: Dict[str, jax.Array], stride: int = 1,
           pad: str = "zero") -> jax.Array:
    """Conv with torch-equivalent (k-1)//2 padding (reference common.py
    :99-124). x: [B, H, W, Cin]; kernel: [kh, kw, Cin, Cout]."""
    k = p["kernel"].shape[0]
    to_pad = (k - 1) // 2
    if pad == "reflection" and to_pad > 0:
        x = jnp.pad(x, ((0, 0), (to_pad, to_pad), (to_pad, to_pad), (0, 0)),
                    mode="reflect")
        padding = "VALID"
    else:
        padding = ((to_pad, to_pad), (to_pad, to_pad))
    # No preferred_element_type: it would make the conv's transpose see
    # mixed dtypes under grad in bf16 mode (MXU still accumulates fp32
    # internally before rounding to the output dtype).
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _downsampler_kernel(kernel_type: str, factor: int) -> np.ndarray:
    """Analytic lanczos/gauss/box kernels (reference downsampler.py:73-135),
    phase=0.5 lanczos as the reference uses (downsampler.py:24-27)."""
    if kernel_type == "box":
        k = np.ones((factor, factor), np.float64) / factor ** 2
        return k
    if kernel_type.startswith("lanczos"):
        support = int(kernel_type[-1])
        phase = 0.5
        # Reference: kernel_width = 2*support*factor + 1, and phase-0.5
        # kernels are (kernel_width - 1)-sized — i.e. EVEN, 2*support*factor
        # (downsampler.py:14-22,77-78). The center keeps the original
        # kernel_width (downsampler.py:103).
        kernel_width = 2 * support * factor + 1
        ksize = kernel_width - 1
        k = np.zeros((ksize, ksize), np.float64)
        center = (kernel_width + 1.0) / 2.0
        for i in range(1, ksize + 1):
            for j in range(1, ksize + 1):
                di = abs(i + 0.5 - center) / factor
                dj = abs(j + 0.5 - center) / factor
                val = 1.0
                for d in (di, dj):
                    if d == 0:
                        continue
                    elif d < support:
                        val *= (support * np.sin(np.pi * d)
                                * np.sin(np.pi * d / support)
                                / (np.pi ** 2 * d ** 2))
                    else:
                        val = 0.0
                k[i - 1, j - 1] = val
        return k / k.sum()
    if kernel_type == "gauss":
        sigma = 0.5
        ksize = int(np.ceil(sigma * 4)) * 2 + 1
        ax = np.arange(ksize) - ksize // 2
        g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
        k = np.outer(g, g)
        return k / k.sum()
    raise ValueError(kernel_type)


def downsample(x: jax.Array, mode: str, factor: int = 2) -> jax.Array:
    """Non-stride downsamplers (reference common.py:99-112,
    downsampler.py:5-71). Used when downsample_mode != 'stride'."""
    if mode == "avg":
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, factor, factor, 1),
            (1, factor, factor, 1), "VALID") / (factor * factor)
    if mode == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, factor, factor, 1),
            (1, factor, factor, 1), "VALID")
    if mode in ("lanczos2", "lanczos3"):
        knp = _downsampler_kernel(mode, factor)
        c = x.shape[-1]
        pad = (knp.shape[0] - factor) // 2 + (knp.shape[0] - factor) % 2
        kern = jnp.asarray(knp, x.dtype)[:, :, None, None]
        kern = jnp.tile(kern, (1, 1, 1, c))
        # preserve_size=True in the reference replication-pads first
        # (downsampler.py:58-63).
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        return jax.lax.conv_general_dilated(
            xp, kern, (factor, factor), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
    raise ValueError(mode)


def gen_noise(key: jax.Array, x: jax.Array, dim2: int) -> jax.Array:
    """GenNoise (reference common.py:45-60): standard-normal tensor with the
    input's spatial shape and `dim2` channels."""
    b, h, w, _ = x.shape
    return jax.random.normal(key, (b, h, w, dim2), x.dtype)


def upsample2(x: jax.Array, mode: str) -> jax.Array:
    """x2 spatial upsample (reference skip.py:82: nn.Upsample(scale_factor=2)).
    bilinear == torch align_corners=False (half-pixel centers)."""
    b, h, w, c = x.shape
    method = {"bilinear": "bilinear", "nearest": "nearest"}[mode]
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method=method)


def center_crop_to(x: jax.Array, th: int, tw: int) -> jax.Array:
    """reference Concat center-crop (common.py:29-40)."""
    h, w = x.shape[1], x.shape[2]
    dh, dw = (h - th) // 2, (w - tw) // 2
    return x[:, dh:dh + th, dw:dw + tw, :]


def concat_crop(xs: Sequence[jax.Array]) -> jax.Array:
    """Concat branches along channels after center-cropping all to the min
    spatial size (reference common.py:11-42)."""
    th = min(x.shape[1] for x in xs)
    tw = min(x.shape[2] for x in xs)
    return jnp.concatenate([center_crop_to(x, th, tw) for x in xs], axis=-1)


# ---------------------------------------------------------------------------
# CHW layout path (TPU-fast)
# ---------------------------------------------------------------------------
# Tests set this to exercise the fused-kernel (interpret-mode) path on CPU;
# production CPU runs keep the XLA formulation.
FORCE_FUSED_KERNELS_ON_CPU = False
# Stride-2 phase-extraction formulation (numerics identical across modes —
# tested in test_unet.py). "permdot" (default) separates phases with two
# MXU dots against constant 0/1 selection matrices instead of any reshape/
# relayout: measured 25.7 -> 28.4 steps/s e2e (round 3, 200-step window) —
# the 6-D reshape's relayout copy ran at ~5 GB/s on the (W/2, 2)-minor stem
# tensor (~2.7 ms/step) while the permutation dots cost ~0.3 ms of MXU time
# and differentiate to transposed permutation dots (no pad/scatter in the
# backward). "slice" = per-tap indexing of the 6-D even-pad reshape (the
# round-2 default); "major" = one phase-major relayout first (measured
# e2e-neutral vs slice).
STRIDE2_PHASE_MODE = "permdot"
# Stride-2 conv dispatch: "phase" = the shifted phase-dot formulation
# (default); "lax" = XLA's native strided convolution, kept as an ablation
# knob. lax.conv wins the isolated microbench decisively (2.0 vs 6.5 ms
# fwd+bwd at the 898px stem) but LOSES end to end: 24.2 vs 25.5 steps/s
# over a 200-step window (round 3, v5e). The spatial conv emitter's wins
# are eaten by the layout transitions XLA inserts around the custom-call-
# free dot graph it replaces — see PERFORMANCE.md negative results.
# "lax_stem" routes ONLY tiny-Cin sites (cin <= 4, i.e. the 3-channel
# stem) through lax.conv: the round-3 trace shows the stem's 6-D phase
# reshape+copy alone costs ~2.7 ms/step (a 10 MB tensor relayouted at
# ~5 GB/s — the (449,2) minor dims tile terribly), while the OTHER
# stride-2 sites lose under lax; and the stem input is data (no dx in
# the backward), which is where the all-sites lax route bled.
STRIDE2_CONV_MODE = "phase"
# Phase-extraction backend inside "phase" mode. "permdot" replaces the
# 6-D even-pad reshape (a relayout copy that profiles at ~5 GB/s on the
# (W/2, 2)-minor stem tensor — ~2.7 ms/step at the 898px stem) with two
# MXU dots against constant 0/1 selection matrices: columns/rows are
# permuted so each phase lands in its own lane/sublane-aligned block,
# making every tap a contiguous block slice. ~20 GFLOP of bf16 permutation
# dots (~0.3 ms) in place of the relayout; the backward differentiates to
# transposed permutation dots (no scatter-adds).


@functools.lru_cache(maxsize=None)
def _phase_perm(n: int, block: int, align: int) -> np.ndarray:
    """[n, 2*block] 0/1 matrix: even indices -> cols [0, n//2), odd ->
    cols [block, block + n - n//2). block is align-rounded n//2... callers
    pass block = round_up(ceil(n/2), align)."""
    m = np.zeros((n, 2 * block), dtype=np.float32)
    for i in range(n):
        m[i, (i % 2) * block + i // 2] = 1.0
    return m
# The generator's channel counts (3..128) are tiny next to the TPU's
# 128-lane registers: in NHWC, XLA keeps C in the lane dimension and pads it
# to 128, wasting up to 8x of HBM traffic and littering the graph with
# layout conversions (profiled: the NHWC U-Net was ~80% of the train step).
# In [B, C, H, W] the full-width W occupies the lanes with zero padding, and
# each kxk conv becomes k*k shifted channel-contraction matmuls whose rhs
# [Cin, H*W] layout is exactly what the MXU wants. Autodiff of this
# formulation yields equally well-laid-out backward dots.

def conv2d_chw(x: jax.Array, p: Dict[str, jax.Array], stride: int = 1,
               pad: str = "zero") -> jax.Array:
    """Conv via shifted dots. x: [B, Cin, H, W]; kernel [kh, kw, Cin, Cout]
    (same param format as the NHWC path); torch (k-1)//2 padding."""
    w = p["kernel"]
    kh, kw, cin, cout = w.shape
    to_pad = (kh - 1) // 2
    B, C, H, W = x.shape
    if to_pad > 0:
        mode = "reflect" if pad == "reflection" else "constant"
        x = jnp.pad(x, ((0, 0), (0, 0), (to_pad, to_pad), (to_pad, to_pad)),
                    mode=mode)
    if stride == 2 and (STRIDE2_CONV_MODE == "lax"
                        or (STRIDE2_CONV_MODE == "lax_stem" and cin <= 4)):
        # XLA's native strided convolution. Wins the isolated microbench
        # (2.0 vs 6.5 ms fwd+bwd at the 898px stem, 1.6 vs 2.3 at 450px)
        # but loses e2e (24.2 vs 25.5 steps/s) — kept as an ablation
        # route only. Input already padded above, so padding="VALID".
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        if "bias" in p:
            out = out + p["bias"].astype(out.dtype)[:, None, None]
        return out
    if stride == 2:
        # Space-to-depth: phases xp[py,px][i,j] = x[2i+py, 2j+px]; the
        # stride-2 tap at (dy, dx) is phase (dy%2, dx%2) shifted by
        # (dy//2, dx//2). Exact rewrite of the strided conv with every dot
        # running at stride 1.
        Hp, Wp = x.shape[2], x.shape[3]
        Ho = (Hp - kh) // 2 + 1
        Wo = (Wp - kw) // 2 + 1
        # Phase extraction via even-pad + reshape, NOT x[:, :, py::2, px::2]:
        # stride-2 slices on the lane (W) dimension lower to XLA gathers
        # (and scatter-adds in the backward) that cost ~2.5 ms each at
        # 896px — ~20 ms/step of pure data movement. The reshape form is
        # numerically identical and lowers to cheap relayout copies.
        # Padding to even H/W always leaves each phase with the
        # (kh-1)//2 + Ho rows the deepest tap shift needs.
        if STRIDE2_PHASE_MODE == "permdot":
            # Phase separation as two permutation matmuls (see knob note).
            # Blocks are lane/sublane aligned so every tap below is a
            # contiguous block slice of xp [B, C, 2*BH, 2*BW].
            BH = -(-((Hp + 1) // 2) // 8) * 8
            BW = -(-((Wp + 1) // 2) // 128) * 128
            sh = jnp.asarray(_phase_perm(Hp, BH, 8), dtype=x.dtype)
            sw = jnp.asarray(_phase_perm(Wp, BW, 128), dtype=x.dtype)
            xp = jnp.einsum("bchw,wj->bchj", x, sw)
            xp = jnp.einsum("bchj,hi->bcij", xp, sh)
            out = None
            for dy in range(kh):
                for dx in range(kw):
                    sl = xp[:, :,
                            (dy % 2) * BH + dy // 2:
                            (dy % 2) * BH + dy // 2 + Ho,
                            (dx % 2) * BW + dx // 2:
                            (dx % 2) * BW + dx // 2 + Wo]
                    t = jnp.einsum("io,bihw->bohw",
                                   w[dy, dx].astype(x.dtype), sl)
                    out = t if out is None else out + t
            out = out.astype(x.dtype)
            if "bias" in p:
                out = out + p["bias"].astype(out.dtype)[:, None, None]
            return out
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Hp % 2), (0, Wp % 2)))
        xr = x.reshape(B, C, x.shape[2] // 2, 2, x.shape[3] // 2, 2)
        # tap accumulation in the input dtype: each dot still accumulates
        # its own contraction in fp32 on the MXU, and bf16 intermediates
        # halve the HBM traffic of the k*k-term sum. Taps slice the 6-D
        # reshape directly (no materialized per-phase arrays: the four
        # [B,C,H/2,W/2] phase copies were ~0.5 ms of relayout each at the
        # 896px sites, and their backward scatter-adds as much again).
        if STRIDE2_PHASE_MODE == "major":
            # One materialized phase-major relayout; taps become contiguous
            # slices of [2,2,B,C,H/2,W/2] (experiment: a single fused
            # transpose vs per-tap 6-D slicing — XLA lays them out
            # differently).
            xr = jnp.moveaxis(xr, (3, 5), (0, 1))
        out = None
        for dy in range(kh):
            for dx in range(kw):
                if STRIDE2_PHASE_MODE == "major":
                    sl = xr[dy % 2, dx % 2, :, :,
                            dy // 2:dy // 2 + Ho, dx // 2:dx // 2 + Wo]
                else:
                    sl = xr[:, :, dy // 2:dy // 2 + Ho, dy % 2,
                            dx // 2:dx // 2 + Wo, dx % 2]
                t = jnp.einsum("io,bihw->bohw", w[dy, dx].astype(x.dtype),
                               sl)
                out = t if out is None else out + t
    else:
        Ho, Wo = x.shape[2] - kh + 1, x.shape[3] - kw + 1
        out = None
        for dy in range(kh):
            for dx in range(kw):
                sl = x[:, :, dy:dy + Ho, dx:dx + Wo]
                t = jnp.einsum("io,bihw->bohw", w[dy, dx].astype(x.dtype),
                               sl)
                out = t if out is None else out + t
    out = out.astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)[:, None, None]
    return out


def upsample2x_chw(x: jax.Array, method: str) -> jax.Array:
    """Exact 2x upsample for [B, C, H, W], matching jax.image.resize /
    torch nn.Upsample(align_corners=False) half-pixel semantics
    (reference skip.py:88 uses nn.Upsample(scale_factor=2, 'bilinear')).
    """
    b, c, h, w = x.shape
    # MEASURED NEGATIVE (round 4, twice): hand-rolled x2 blends lose to
    # jax.image.resize here. (a) stack+reshape interleave: the [..., w, 2]
    # intermediate puts a size-2 dim lane-minor and XLA relayouts every
    # element (+3 ms/step of copies at the flagship workload, 30.1 ->
    # 26.1 steps/s). (b) 32-bit pack + bitcast_convert interleave: TPU
    # bf16 tiling pairs SUBLANES (2,1), not lanes, so the bitcast forms
    # are just as layout-hostile (26.1 -> 24.3). XLA's separable resize
    # (two 1-D convs, ~1.3 ms/step for all U-Net scales) wins; keep this
    # wrapper as the single callsite so future attempts slot in here.
    return jax.image.resize(x, (b, c, 2 * h, 2 * w), method=method)


def bn_affine_from_sums(s1: jax.Array, s2: jax.Array, count: int,
                        p: Dict[str, jax.Array], eps: float = 1e-5
                        ) -> Tuple[jax.Array, jax.Array]:
    """bn_affine_chw from precomputed per-channel fp32 sums (s1 = sum x,
    s2 = sum x^2 over B, H, W; count = B*H*W). Lets a concat consumer's
    BN statistics be assembled from per-branch reductions that XLA fuses
    into each branch's producer — instead of re-reading the materialized
    full-resolution concat from HBM (profiled ~0.8 ms/step across the
    post_bn sites at the flagship workload)."""
    mean = s1 / count
    ex2 = s2 / count
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * inv
    return inv, shift


def _channel_sums(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-channel fp32 (sum, sum-of-squares) over B, H, W of [B,C,H,W]."""
    x32 = x.astype(jnp.float32)
    return jnp.sum(x32, axis=(0, 2, 3)), jnp.sum(jnp.square(x32),
                                                 axis=(0, 2, 3))


def bn_affine_chw(x: jax.Array, p: Dict[str, jax.Array],
                  eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Train-mode BN as per-channel (scale, shift) fp32 vectors for
    [B, C, H, W]: y = x*scale + shift. Single-pass stats: mean and E[x^2]
    reduce together in fp32, so the activation is read once for
    statistics instead of twice. E[x^2]-m^2 in fp32 on O(1) activations
    loses no precision that matters (bf16 inputs carry ~3 decimal
    digits)."""
    mean = jnp.mean(x, axis=(0, 2, 3), dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 2, 3))
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * inv
    return inv, shift


# Minimum operating lane width for routing a conv site to the Pallas
# kernels (auto dispatch). 448 was the round-2 e2e-measured cutoff with
# the VALID pre-padded kernels; the SAME-border kernels changed the
# tradeoff (no pad-to-128 blowup), so the cutoff is a knob for
# re-measurement (scripts/ablate.py kw<N>).
PALLAS_MIN_WIDTH = 448


def batch_norm_chw(x: jax.Array, p: Dict[str, jax.Array],
                   eps: float = 1e-5) -> jax.Array:
    """batch_norm for [B, C, H, W] (same math; stats over B, H, W)."""
    inv, shift = bn_affine_chw(x, p, eps)
    return x * inv.astype(x.dtype)[:, None, None] \
        + shift.astype(x.dtype)[:, None, None]


def _skip_apply_chw_fused(params: Dict[str, Any], cfg: SkipConfig,
                          x_nhwc: jax.Array, compute_dtype=None
                          ) -> jax.Array:
    """skip_apply with deferred BatchNorm: every conv consumes its
    producer's RAW output plus the BN (scale, shift) vectors, applying
    normalize+activate inside the Pallas conv kernel's input prologue
    (ops/conv_pallas.py pallas_conv_bn_act_chw). The normalized tensor is
    never written to HBM, and 1x1/stride-2 sites route through the kernel
    without breaking XLA elementwise fusion (the fusion-breakage penalty
    that kept them on XLA dots). BN statistics still read the raw tensor
    once (XLA reduction); numerics match act(batch_norm(conv(x))) to
    rounding (prologue computes the affine in fp32).

    Requires act_fun LeakyReLU/none and downsample_mode 'stride'
    (callers gate)."""
    from splice_tpu.ops.conv_pallas import (SAME_BORDER_KERNELS,
                                            pallas_conv_bn_act_chw,
                                            pallas_conv_chw)

    negslope = {"LeakyReLU": 0.2, "none": 1.0}[cfg.act_fun]
    on_tpu = jax.default_backend() != "cpu" or FORCE_FUSED_KERNELS_ON_CPU

    def fuse_worthwhile(x, stride):
        """Route through the fused Pallas kernel only where the kernel's
        operating width is large (>= 448 lanes; stride 2 halves it via
        space-to-depth): at small widths the per-tile kernel overhead
        loses to XLA's fused dots (measured e2e: all-Pallas 21.9 steps/s
        vs hybrid; same shape of result as the round-1 auto heuristic)."""
        hw = x.shape[3] // (2 if stride == 2 else 1)
        return on_tpu and (hw >= PALLAS_MIN_WIDTH
                           or FORCE_FUSED_KERNELS_ON_CPU)

    def conv_plain(x, p, stride):
        if on_tpu and stride == 1 and p["kernel"].shape[0] >= 3 \
                and x.shape[3] >= PALLAS_MIN_WIDTH and x.shape[1] > 16:
            return pallas_conv_chw(x, p, stride, cfg.pad)
        return conv2d_chw(x, p, stride, cfg.pad)

    def conv_from(src, p, stride):
        """src: raw tensor, or (raw, scale, shift) pending BN+act."""
        if isinstance(src, tuple):
            raw, sc, sh = src
            if fuse_worthwhile(raw, stride):
                return pallas_conv_bn_act_chw(raw, p, sc, sh, stride,
                                              cfg.pad, negslope)
            return conv_plain(materialize(src), p, stride)
        return conv_plain(src, p, stride)

    def materialize(src):
        if not isinstance(src, tuple):
            return src
        raw, sc, sh = src
        y = raw * sc.astype(raw.dtype)[:, None, None] \
            + sh.astype(raw.dtype)[:, None, None]
        return act(y, cfg.act_fun)

    def pend(raw, bn_p):
        sc, sh = bn_affine_chw(raw, bn_p)
        return (raw, sc, sh)

    def pend_conv(src, p, stride, bn_p):
        """conv followed by a pending BN whose statistics come straight
        from the conv kernel (computed on the output tile in VMEM, see
        conv_pallas want_stats) when the site routes to the fused SAME
        kernel — the XLA reduction otherwise re-reads the full-resolution
        output from HBM just to take its mean/var."""
        if (isinstance(src, tuple) and stride == 1
                and p["kernel"].shape[0] > 1 and cfg.pad != "reflection"
                and SAME_BORDER_KERNELS and fuse_worthwhile(src[0], stride)):
            raw0, sc0, sh0 = src
            out, s1, s2 = pallas_conv_bn_act_chw(
                raw0, p, sc0, sh0, stride, cfg.pad, negslope,
                want_stats=True)
            n = out.shape[0] * out.shape[2] * out.shape[3]
            sc, sh = bn_affine_from_sums(s1, s2, n, bn_p)
            return (out, sc, sh)
        return pend(conv_from(src, p, stride), bn_p)

    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = cfg.n_scales

    def scale_fn(i: int, xin):
        """xin: raw tensor or pending; returns a PENDING (raw, sc, sh)."""
        sp = params["scales"][i]
        branches = []
        if cfg.channels_skip[i]:
            s_raw = conv_from(xin, sp["skip_conv"], 1)
            branches.append(materialize(pend(s_raw, sp["skip_bn"])))
        d1 = pend(conv_from(xin, sp["down_conv1"], 2), sp["down_bn1"])
        d2 = pend_conv(d1, sp["down_conv2"], 1, sp["down_bn2"])
        inner = materialize(scale_fn(i + 1, d2)) if i < n - 1 \
            else materialize(d2)
        u = upsample2x_chw(inner, cfg.upsample_mode)
        branches.append(u)
        th = min(t.shape[2] for t in branches)
        tw = min(t.shape[3] for t in branches)
        branches = [t[:, :, (t.shape[2] - th) // 2:(t.shape[2] - th) // 2
                      + th, (t.shape[3] - tw) // 2:(t.shape[3] - tw) // 2
                      + tw] for t in branches]
        y = jnp.concatenate(branches, axis=1)
        # post_bn (reference skip.py:56) has NO activation: affine-only
        # prologue (negslope 1.0) into the up conv. Statistics are
        # assembled from per-branch sums (fused by XLA into each branch's
        # producer) so the materialized concat is not re-read from HBM.
        b0 = branches[0]
        count = b0.shape[0] * b0.shape[2] * b0.shape[3]
        sums = [_channel_sums(t) for t in branches]
        pb_sc, pb_sh = bn_affine_from_sums(
            jnp.concatenate([s[0] for s in sums]),
            jnp.concatenate([s[1] for s in sums]), count, sp["post_bn"])
        if fuse_worthwhile(y, 1):
            ksize = sp["up_conv"]["kernel"].shape[0]
            if (ksize > 1 and cfg.pad != "reflection"
                    and SAME_BORDER_KERNELS):
                y1, s1, s2 = pallas_conv_bn_act_chw(
                    y, sp["up_conv"], pb_sc, pb_sh, 1, cfg.pad, 1.0,
                    want_stats=True)
                cnt = y1.shape[0] * y1.shape[2] * y1.shape[3]
                y1p = (y1, *bn_affine_from_sums(s1, s2, cnt, sp["up_bn"]))
            else:
                y1 = pallas_conv_bn_act_chw(y, sp["up_conv"], pb_sc,
                                            pb_sh, 1, cfg.pad, 1.0)
                y1p = pend(y1, sp["up_bn"])
        else:
            ym = y * pb_sc.astype(y.dtype)[:, None, None] \
                + pb_sh.astype(y.dtype)[:, None, None]
            y1 = conv_plain(ym, sp["up_conv"], 1)
            y1p = pend(y1, sp["up_bn"])
        if not cfg.need1x1_up:
            return y1p
        y2 = conv_from(y1p, sp["up1x1_conv"], 1)
        return pend(y2, sp["up1x1_bn"])

    y_pend = scale_fn(0, x)
    y = conv_from(y_pend, params["out_conv"], 1).astype(jnp.float32)
    if cfg.need_sigmoid:
        y = jax.nn.sigmoid(y)
    elif cfg.need_tanh:
        y = jnp.tanh(y)
    return jnp.transpose(y, (0, 2, 3, 1))


def skip_apply_chw(params: Dict[str, Any], cfg: SkipConfig,
                   x_nhwc: jax.Array, compute_dtype=None,
                   conv_impl: str = "pallas") -> jax.Array:
    """skip_apply computed internally in CHW; NHWC in/out, fp32 out.

    conv_impl: "pallas" routes convs through the fused TPU kernel
    (splice_tpu/ops/conv_pallas.py); "xla" uses the shifted-dot
    formulation above; "fused" additionally defers every BatchNorm apply
    + activation into the consumer conv's in-kernel prologue
    (_skip_apply_chw_fused).

    Supports the training path (downsample_mode='stride', zero/reflection
    pad); other downsamplers fall back to the NHWC path.
    """
    if cfg.downsample_mode != "stride":
        return skip_apply(params, cfg, x_nhwc, compute_dtype)
    if conv_impl == "fused":
        if cfg.act_fun in ("LeakyReLU", "none"):
            return _skip_apply_chw_fused(params, cfg, x_nhwc, compute_dtype)
        # The fused prologue only implements leaky-relu/identity; degrade
        # to the measured per-site auto dispatch rather than silently
        # falling through to the all-XLA formulation.
        conv_impl = "auto"
    if conv_impl in ("pallas", "auto") and jax.default_backend() != "cpu":
        # On CPU the kernel would run in (slow) interpret mode; the XLA
        # shifted-dot formulation is the right backend there.
        from splice_tpu.ops.conv_pallas import pallas_conv_chw
        if conv_impl == "pallas":
            conv_fn = pallas_conv_chw
        else:
            def conv_fn(x, p, stride=1, pad="zero"):
                """Per-site dispatch, v5e-measured END TO END (the only
                measurement that held up): only the large-spatial stride-1
                k>=3 convs — where the XLA shifted dots re-read a big
                input slab k^2 times — go to the Pallas kernel. Isolated
                microbenchmarks also favored Pallas for 1x1 and tiny-HW
                sites, but routing those regressed the full train step
                (custom-calls break XLA's BN/act fusion around the dots),
                so everything else stays on the XLA formulation; stride-2
                stays on the reshape-phase dots (re-measured with the
                round-2 flat-slab kernels: routing hw>=448 stride-2 sites
                through the s2d kernel regressed 24.1 -> 22.3 steps/s)."""
                kh = p["kernel"].shape[0]
                cin, hw = x.shape[1], x.shape[3]
                if stride == 1 and kh >= 3 and hw >= PALLAS_MIN_WIDTH \
                        and cin > 16:
                    return pallas_conv_chw(x, p, stride, pad)
                return conv2d_chw(x, p, stride, pad)
    else:
        conv_fn = conv2d_chw
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = cfg.n_scales

    def scale_fn(i: int, xin: jax.Array) -> jax.Array:
        sp = params["scales"][i]
        branches = []
        if cfg.channels_skip[i]:
            s = conv_fn(xin, sp["skip_conv"], 1, cfg.pad)
            s = act(batch_norm_chw(s, sp["skip_bn"]), cfg.act_fun)
            branches.append(s)
        d = conv_fn(xin, sp["down_conv1"], 2, cfg.pad)
        d = act(batch_norm_chw(d, sp["down_bn1"]), cfg.act_fun)
        d = conv_fn(d, sp["down_conv2"], 1, cfg.pad)
        d = act(batch_norm_chw(d, sp["down_bn2"]), cfg.act_fun)
        inner = scale_fn(i + 1, d) if i < n - 1 else d
        u = upsample2x_chw(inner, cfg.upsample_mode)
        branches.append(u)
        th = min(t.shape[2] for t in branches)
        tw = min(t.shape[3] for t in branches)
        branches = [t[:, :, (t.shape[2] - th) // 2:(t.shape[2] - th) // 2
                      + th, (t.shape[3] - tw) // 2:(t.shape[3] - tw) // 2
                      + tw] for t in branches]
        y = jnp.concatenate(branches, axis=1)
        y = batch_norm_chw(y, sp["post_bn"])
        y = act(batch_norm_chw(conv_fn(y, sp["up_conv"], 1, cfg.pad),
                               sp["up_bn"]), cfg.act_fun)
        if cfg.need1x1_up:
            y = act(batch_norm_chw(conv_fn(y, sp["up1x1_conv"], 1,
                                           cfg.pad), sp["up1x1_bn"]),
                    cfg.act_fun)
        return y

    y = scale_fn(0, x)
    y = conv_fn(y, params["out_conv"], 1, cfg.pad).astype(jnp.float32)
    if cfg.need_sigmoid:
        y = jax.nn.sigmoid(y)
    elif cfg.need_tanh:
        y = jnp.tanh(y)
    return jnp.transpose(y, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Init (reference networks.py:24-53 semantics)
# ---------------------------------------------------------------------------

def _init_conv_kernel(key, shape, init_type: str, gain: float):
    kh, kw, cin, cout = shape
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    if init_type == "normal":
        w = gain * jax.random.normal(key, shape)
    elif init_type == "xavier":
        std = gain * float(np.sqrt(2.0 / (fan_in + fan_out)))
        w = std * jax.random.normal(key, shape)
    elif init_type == "kaiming":
        std = float(np.sqrt(2.0 / fan_in))
        w = std * jax.random.normal(key, shape)
    elif init_type == "orthogonal":
        # torch init.orthogonal_ semantics: rows = cout, cols = fan_in;
        # when rows < cols it orthogonalizes the transpose (reduced QR of
        # a wide matrix would yield too few columns to fill the weight —
        # the old code crashed whenever cout > fan_in, e.g. the default
        # 1x1 skip conv with cin=3, cout=4).
        rows, cols = cout, fan_in
        tall = (max(rows, cols), min(rows, cols))
        q, r = jnp.linalg.qr(jax.random.normal(key, tall))
        q = q * jnp.sign(jnp.diagonal(r))
        mat = q if rows >= cols else q.T                 # [cout, fan_in]
        # torch fills weight.view(cout, cin*kh*kw) -> [kh,kw,cin,cout] here
        w = gain * jnp.transpose(mat.reshape(cout, cin, kh, kw),
                                 (2, 3, 1, 0))
    else:
        raise ValueError(init_type)
    return w.astype(jnp.float32)


def _conv_params(key, kh, cin, cout, init_type, gain, bias=True):
    p = {"kernel": _init_conv_kernel(key, (kh, kh, cin, cout),
                                     init_type, gain)}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _bn_params(key, c, gain):
    # reference networks.py:44-46: BN weight ~ N(1, gain), bias 0.
    return {"scale": 1.0 + gain * jax.random.normal(key, (c,)),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_skip_params(key: jax.Array, cfg: SkipConfig,
                     init_type: str = "xavier",
                     init_gain: float = 0.02) -> Dict[str, Any]:
    n = cfg.n_scales
    last = n - 1
    keys = iter(jax.random.split(key, 12 * n + 4))
    scales: List[Dict[str, Any]] = []
    in_ch = cfg.num_input_channels
    for i in range(n):
        cd, cu, cs = cfg.channels_down[i], cfg.channels_up[i], cfg.channels_skip[i]
        k_inner = cfg.channels_down[i] if i == last else cfg.channels_up[i + 1]
        sp: Dict[str, Any] = {}
        if cs:
            sp["skip_conv"] = _conv_params(next(keys), cfg.filter_skip_size,
                                           in_ch, cs, init_type, init_gain,
                                           cfg.need_bias)
            sp["skip_bn"] = _bn_params(next(keys), cs, init_gain)
        sp["down_conv1"] = _conv_params(next(keys), cfg.fdown(i), in_ch, cd,
                                        init_type, init_gain, cfg.need_bias)
        sp["down_bn1"] = _bn_params(next(keys), cd, init_gain)
        sp["down_conv2"] = _conv_params(next(keys), cfg.fdown(i), cd, cd,
                                        init_type, init_gain, cfg.need_bias)
        sp["down_bn2"] = _bn_params(next(keys), cd, init_gain)
        # BN inserted right after Concat (reference skip.py:56).
        sp["post_bn"] = _bn_params(next(keys), cs + k_inner, init_gain)
        sp["up_conv"] = _conv_params(next(keys), cfg.fup(i), cs + k_inner, cu,
                                     init_type, init_gain, cfg.need_bias)
        sp["up_bn"] = _bn_params(next(keys), cu, init_gain)
        if cfg.need1x1_up:
            sp["up1x1_conv"] = _conv_params(next(keys), 1, cu, cu,
                                            init_type, init_gain, cfg.need_bias)
            sp["up1x1_bn"] = _bn_params(next(keys), cu, init_gain)
        scales.append(sp)
        in_ch = cd
    out_conv = _conv_params(next(keys), 1, cfg.channels_up[0],
                            cfg.num_output_channels, init_type, init_gain,
                            cfg.need_bias)
    return {"scales": scales, "out_conv": out_conv}


# ---------------------------------------------------------------------------
# Forward (reference skip.py:42-102 topology)
# ---------------------------------------------------------------------------

def skip_apply(params: Dict[str, Any], cfg: SkipConfig,
               x: jax.Array, compute_dtype=None) -> jax.Array:
    """Generator forward. x: [B, H, W, Cin] in [0,1] -> [B, H', W', Cout]
    float32.

    H'/W' equal H/W when H, W are multiples of 2**n_scales; otherwise the
    center-crop concat trims exactly as the reference does.

    compute_dtype=bfloat16 runs the convs on the MXU at full rate (fp32
    conv is ~8x slower on TPU and dominates the step at full-res crops);
    params stay fp32 masters, BatchNorm statistics are always fp32
    (batch_norm internals), and the output is returned in fp32.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = cfg.n_scales

    def scale_fn(i: int, xin: jax.Array) -> jax.Array:
        sp = params["scales"][i]
        branches = []
        if cfg.channels_skip[i]:
            s = conv2d(xin, sp["skip_conv"], 1, cfg.pad)
            s = act(batch_norm(s, sp["skip_bn"]), cfg.act_fun)
            branches.append(s)
        if cfg.downsample_mode == "stride":
            d = conv2d(xin, sp["down_conv1"], 2, cfg.pad)
        else:
            d = conv2d(xin, sp["down_conv1"], 1, cfg.pad)
            d = downsample(d, cfg.downsample_mode, 2)
        d = act(batch_norm(d, sp["down_bn1"]), cfg.act_fun)
        d = conv2d(d, sp["down_conv2"], 1, cfg.pad)
        d = act(batch_norm(d, sp["down_bn2"]), cfg.act_fun)
        inner = scale_fn(i + 1, d) if i < n - 1 else d
        u = upsample2(inner, cfg.upsample_mode)
        branches.append(u)
        y = concat_crop(branches)
        y = batch_norm(y, sp["post_bn"])
        y = act(batch_norm(conv2d(y, sp["up_conv"], 1, cfg.pad),
                           sp["up_bn"]), cfg.act_fun)
        if cfg.need1x1_up:
            y = act(batch_norm(conv2d(y, sp["up1x1_conv"], 1, cfg.pad),
                               sp["up1x1_bn"]), cfg.act_fun)
        return y

    y = scale_fn(0, x)
    y = conv2d(y, params["out_conv"], 1, cfg.pad).astype(jnp.float32)
    if cfg.need_sigmoid:
        y = jax.nn.sigmoid(y)
    elif cfg.need_tanh:
        y = jnp.tanh(y)
    return y


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
