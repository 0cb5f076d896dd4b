"""Pallas TPU kernel: small-channel 2-D convolution in CHW layout.

Why: the splice generator's channel counts (3..128) are tiny next to the
TPU's 128-lane registers. XLA's conv (NHWC) pads C to 128 lanes (up to 8x
HBM traffic), and the XLA dot formulation of a CHW conv materializes a
C-minor transpose around every tap's matmul (profiled: together ~70% of the
train step). This kernel keeps a [Cin, rows, W] slab resident in VMEM —
W fully occupying the lanes, no padding waste — and accumulates the k*k
taps as channel-contraction matmuls on the MXU, reading x once and writing
y once per tile.

Tiling: the output is split into row bands of `ht` rows. Each band needs
k-1 halo rows from the next band; Pallas blocks cannot overlap, so the halo
rows are gathered into a small side tensor ([B, tiles, Cin, k-1, W]) in XLA
and concatenated onto the band inside VMEM.

Supports: stride 1, k x k kernels (k=2 serves the space-to-depth phase
decomposition of stride-2 convs), fp32 accumulation, fused bias. Gradients
via custom VJP: dx reuses this kernel with the rotated/io-swapped kernel;
dw is a second Pallas kernel accumulating tap correlations across the grid.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_per_tile(cin: int, cout: int, k: int, wp: int,
                   itemsize: int) -> int:
    """Pick the H-tile so slab + accumulator fit comfortably in VMEM."""
    budget = 2 * 1024 * 1024
    lanes = ((wp + 127) // 128) * 128
    per_row = (cin + cout) * lanes * itemsize + cout * lanes * 4
    rows = max(budget // max(per_row, 1), 8)
    rows = (rows // 8) * 8       # sublane-divisible tiles (Mosaic requires)
    return int(max(8, min(rows, 256)))


def _roll_left2d(xs, dx: int):
    """Lane-roll left by dx for a 2-D [rows, L] operand (axis 1)."""
    L = xs.shape[1]
    if xs.dtype.itemsize == 4:
        return pltpu.roll(xs, L - dx, 1)
    if xs.shape[0] % 2 == 0:
        xi = pltpu.bitcast(xs, jnp.int32)
        return pltpu.bitcast(pltpu.roll(xi, L - dx, 1), xs.dtype)
    return pltpu.roll(xs.astype(jnp.float32), L - dx, 1).astype(xs.dtype)


def _flat_slab(x_part, halo_part, k: int, ht: int, wp: int,
               prologue=None):
    """[Cin, (ht+k-1)*Wp] flattened slab: x block and halo rows are
    flattened SEPARATELY then concatenated on lanes at offset ht*Wp (a
    multiple of 128, so the concat is tile-aligned) — reshaping the 3-D
    row-concat instead trips Mosaic's layout checker under a blocked
    grid ("Invalid input layout").

    prologue: optional (scale_ref, shift_ref, negslope) — applies the
    deferred-BatchNorm affine + LeakyReLU to the slab IN VMEM:
    z = leaky(x*scale + shift). Fusing the normalize+activate into the
    consumer conv's input read removes the separate full-resolution
    elementwise pass between BN statistics and the next conv (and lets
    1x1/small sites route to the kernel without breaking XLA's
    elementwise fusion around a custom-call)."""
    cin = x_part.shape[0]
    flat = x_part.reshape(cin, ht * wp)
    if k > 1:
        flat = jnp.concatenate(
            [flat, halo_part.reshape(cin, (k - 1) * wp)], axis=1)
    if prologue is not None:
        scale_ref, shift_ref, negslope = prologue
        z = flat.astype(jnp.float32) * scale_ref[...] + shift_ref[...]
        if negslope != 1.0:
            z = jnp.where(z >= 0, z, z * negslope)
        flat = z.astype(flat.dtype)
    return flat


def _flat_taps(flat, k: int, ht: int, wp: int):
    """All k*k shifted tap operands as lane-views of a flattened slab.

    flat: [Cin, (ht+k-1)*Wp] from _flat_slab. The naive per-tap pipeline
    (slice rows, roll lanes, reshape to [Cin, ht*Wp]) pays a full
    cross-sublane relayout per tap (the (ht, Wp)->(ht*Wp) shape cast
    moves every element to a new sublane) plus a lane-shuffle roll per
    dx — 9 relayouts + 6 rolls per tile for k=3, which dominated the
    kernel (profiled well off the HBM roofline). Flattened form pays ONE
    relayout + (k-1) rolls: Wp is always lane-aligned (128 | Wp, enforced
    by the caller), so the dy shift becomes a lane-slice at offset dy*Wp
    — a whole-tile-aligned, shuffle-free view. The roll's wrap-around
    contaminates only the last dx lanes of each row, which lie beyond
    the valid output width (the caller slices to Wp-k+1 <= Wp-dx
    columns), same argument as the old per-tap roll.

    Returns taps[dy*k+dx] each [Cin, ht*Wp].
    """
    rolled = [flat] + [_roll_left2d(flat, dx) for dx in range(1, k)]
    taps = []
    for dy in range(k):
        for dx in range(k):
            taps.append(rolled[dx][:, dy * wp:dy * wp + ht * wp])
    return taps


def _halo(xp: jax.Array, ht: int, n_tiles: int, k: int) -> jax.Array:
    """[B, n_tiles, Cin, k-1, Wp]: rows (i+1)*ht .. (i+1)*ht+k-2 per tile."""
    B, cin, hp, wp = xp.shape
    if k == 1:
        # no halo needed; one dummy row to satisfy the (min 1) block shape
        return jnp.zeros((B, n_tiles, cin, 1, wp), xp.dtype)
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, (i + 1) * ht, k - 1, axis=2)
         for i in range(n_tiles)], axis=1)


def _make_conv_kernel(k: int, ht: int, kpack: bool, has_pro: bool,
                      negslope: float):
    """Forward conv kernel over one [1, Cin, ht, Wp] block.

    kpack: stack the k*k shifted taps into ONE [k*k*Cin, ht*Wp] operand so
    the whole conv is a single MXU dot with contraction depth k*k*Cin
    instead of k*k skinny K=Cin dots (the systolic array runs at K/128
    utilization — 9 taps of K=16 waste 7/8 of every pass).
    has_pro: two extra [Cin, 1] fp32 refs (scale, shift) — deferred-BN
    affine + LeakyReLU(negslope) applied to the slab in VMEM."""

    def kernel(*refs):
        if has_pro:
            x_ref, halo_ref, w_ref, s_ref, t_ref, o_ref, acc_ref = refs
            pro = (s_ref, t_ref, negslope)
        else:
            x_ref, halo_ref, w_ref, o_ref, acc_ref = refs
            pro = None
        cin = x_ref.shape[1]
        cout = o_ref.shape[1]
        wp = x_ref.shape[3]
        flat = _flat_slab(x_ref[0], halo_ref[0, 0] if k > 1 else None, k,
                          ht, wp, pro)
        taps = _flat_taps(flat, k, ht, wp)
        if kpack:
            # [k*k, Cin, ht*Wp] -> [k*k*Cin, ht*Wp]: leading-dim merge,
            # no relayout (the minor ht*Wp dim is untouched).
            big = jnp.stack(taps, axis=0).reshape(k * k * cin, ht * wp)
            acc_ref[:] = jax.lax.dot_general(
                w_ref[...], big, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc_ref[:] = jnp.zeros_like(acc_ref)
            for t in range(k * k):
                acc_ref[:] += jax.lax.dot_general(
                    w_ref[t], taps[t], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [Cout, ht*Wp]
        o_ref[0] = acc_ref[:].reshape(cout, ht, wp).astype(o_ref.dtype)

    return kernel


def _conv_fwd_impl(xp: jax.Array, w: jax.Array, k: int,
                   scale: Optional[jax.Array] = None,
                   shift: Optional[jax.Array] = None,
                   negslope: float = 0.2) -> jax.Array:
    """xp: [B, Cin, Hp, Wp] pre-padded; w: [k, k, Cin, Cout].
    Returns [B, Cout, Hp-k+1, Wp]; only the first Wp-k+1 columns are valid
    (caller slices). scale/shift [Cin]: optional fused input prologue
    z = leaky_{negslope}(x*scale + shift) (deferred BatchNorm apply).

    Prologue + lane/row zero-padding is safe: padded columns are never
    read by a valid output (taps reach at most col Wp0-1), and padded
    rows only feed outputs >= ho, which are sliced off."""
    B, cin, hp, wp0 = xp.shape
    cout = w.shape[-1]
    ho = hp - k + 1
    # Lane-align W: Mosaic's (ht, wp) -> (ht*wp) shape cast inside the
    # kernel needs wp to be a multiple of 128. Padding columns are zeros
    # and fall outside the valid output width.
    wp = ((wp0 + 127) // 128) * 128
    if wp > wp0:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - wp0)))
    kpack = k > 1 and wp >= 768
    if kpack:
        # The stacked-tap operand multiplies the per-row VMEM k*k-fold;
        # shrink the row tile accordingly. (_rows_per_tile keeps rows
        # sublane-divisible; the bf16 lane-roll bitcast in _roll_left2d
        # gates on Cin parity, not row count.)
        ht = min(_rows_per_tile(cin * (k * k + 1), cout, k, wp,
                                xp.dtype.itemsize), ho)
        ht = max(ht, 8)
    else:
        ht = min(_rows_per_tile(cin, cout, k, wp, xp.dtype.itemsize), ho)
    n_tiles = pl.cdiv(ho, ht)
    hp_need = n_tiles * ht + k - 1
    if hp_need > hp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, hp_need - hp), (0, 0)))
    halo = _halo(xp, ht, n_tiles, k)
    if kpack:
        wk = w.reshape(k * k, cin, cout).reshape(k * k * cin, cout)
        wspec = pl.BlockSpec(wk.shape, lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM)
    else:
        wk = w.reshape(k * k, cin, cout)
        wspec = pl.BlockSpec(wk.shape, lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    has_pro = scale is not None
    kernel = _make_conv_kernel(k, ht, kpack, has_pro, negslope)
    in_specs = [
        pl.BlockSpec((1, cin, ht, wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin, max(k - 1, 1), wp),
                     lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        wspec,
    ]
    args = [xp[:, :, :n_tiles * ht, :], halo, wk]
    if has_pro:
        vec = pl.BlockSpec((cin, 1), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)
        in_specs += [vec, vec]
        args += [scale.reshape(cin, 1).astype(jnp.float32),
                 shift.reshape(cin, 1).astype(jnp.float32)]
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, cout, n_tiles * ht, wp),
                                       xp.dtype),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cout, ht, wp), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cout, ht * wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * k * k * cin * cout * ho * wp,
            bytes_accessed=(B * cin * hp * wp + B * cout * ho * wp)
            * xp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:, :, :ho, :]


def _make_dw_kernel(k: int, ht: int, has_pro: bool, negslope: float):
    """Accumulate dw[k*k*Cin, Cout] over grid tiles: ONE tap-packed
    [k*k*Cin, ht*Wp] x [ht*Wp, Cout] dot per tile instead of k*k skinny
    M=Cin dots — ceil(k*k*Cin/128) MXU output tiles stream the pixel
    contraction once, vs k*k separate streams. has_pro: the fused-conv
    backward recomputes z = leaky(x*scale+shift) on the slab in VMEM (z
    is never materialized in HBM)."""

    def kernel(*refs):
        if has_pro:
            x_ref, halo_ref, g_ref, s_ref, t_ref, dw_ref, acc_ref = refs
            pro = (s_ref, t_ref, negslope)
        else:
            x_ref, halo_ref, g_ref, dw_ref, acc_ref = refs
            pro = None
        b = pl.program_id(0)
        i = pl.program_id(1)
        cin = x_ref.shape[1]
        cout = g_ref.shape[1]
        wp = x_ref.shape[3]

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        flat = _flat_slab(x_ref[0], halo_ref[0, 0] if k > 1 else None, k,
                          ht, wp, pro)
        # g is zero-padded to [n_tiles*ht, wp] by _dw_impl, so invalid
        # rows/columns already contribute nothing to the dot.
        g2 = g_ref[0].reshape(cout, ht * wp)
        taps = _flat_taps(flat, k, ht, wp)
        big = jnp.stack(taps, axis=0).reshape(k * k * cin, ht * wp)
        acc_ref[:] += jax.lax.dot_general(
            big, g2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [k*k*Cin, Cout]
        last = jnp.logical_and(b == pl.num_programs(0) - 1,
                               i == pl.num_programs(1) - 1)

        @pl.when(last)
        def _():
            dw_ref[:] = acc_ref[:].astype(dw_ref.dtype)

    return kernel


def _dw_impl(xp: jax.Array, g: jax.Array, k: int,
             scale: Optional[jax.Array] = None,
             shift: Optional[jax.Array] = None,
             negslope: float = 0.2) -> jax.Array:
    """dw for the VALID conv on pre-padded xp. g: [B, Cout, Ho, Wo];
    returns [k, k, Cin, Cout] fp32. scale/shift: fused input prologue
    (see _conv_fwd_impl)."""
    B, cin, hp, wp0 = xp.shape
    cout = g.shape[1]
    ho = hp - k + 1
    wp = ((wp0 + 127) // 128) * 128
    if wp > wp0:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - wp0)))
    ht = min(_rows_per_tile(cin, cout, k, wp, xp.dtype.itemsize), ho)
    n_tiles = pl.cdiv(ho, ht)
    hp_need = n_tiles * ht + k - 1
    if hp_need > hp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, hp_need - hp), (0, 0)))
    halo = _halo(xp, ht, n_tiles, k)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, n_tiles * ht - g.shape[2]),
                     (0, wp - g.shape[3])))
    has_pro = scale is not None
    kernel = _make_dw_kernel(k, ht, has_pro, negslope)
    in_specs = [
        pl.BlockSpec((1, cin, ht, wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin, max(k - 1, 1), wp),
                     lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout, ht, wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp[:, :, :n_tiles * ht, :], halo, gp]
    if has_pro:
        vec = pl.BlockSpec((cin, 1), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)
        in_specs += [vec, vec]
        args += [scale.reshape(cin, 1).astype(jnp.float32),
                 shift.reshape(cin, 1).astype(jnp.float32)]
    interpret = jax.default_backend() == "cpu"
    dw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k * k * cin, cout), jnp.float32),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k * k * cin, cout), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k * k * cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dw.reshape(k, k, cin, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_valid_chw(xp: jax.Array, w: jax.Array, k: int) -> jax.Array:
    """VALID k x k stride-1 conv on pre-padded CHW input via the Pallas
    kernel. xp: [B, Cin, Hp, Wp]; w: [k, k, Cin, Cout] ->
    [B, Cout, Hp-k+1, Wp-k+1]."""
    out = _conv_fwd_impl(xp, w.astype(xp.dtype), k)
    return out[:, :, :, :xp.shape[3] - k + 1]


def _conv_fwd(xp, w, k):
    return conv_valid_chw(xp, w, k), (xp, w)


def _conv_bwd(k, res, g):
    xp, w = res
    B, cin, hp, wp = xp.shape
    # dx: full correlation of g with the flipped, io-swapped kernel.
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)  # [k,k,Co,Ci]
    gp = jnp.pad(g, ((0, 0), (0, 0), (k - 1, k - 1), (k - 1, k - 1)))
    dx = _conv_fwd_impl(gp.astype(xp.dtype), w_flip.astype(xp.dtype), k)
    dx = dx[:, :, :hp, :wp]
    # dw: tap correlations, accumulated in the Pallas reduction kernel.
    dw = _dw_impl(xp, g.astype(xp.dtype), k).astype(w.dtype)
    return dx.astype(xp.dtype), dw


conv_valid_chw.defvjp(_conv_fwd, _conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_pro_valid_chw(xp: jax.Array, w: jax.Array, scale: jax.Array,
                       shift: jax.Array, k: int,
                       negslope: float) -> jax.Array:
    """VALID k x k stride-1 conv of the deferred-BN prologue:
    y = conv(leaky_{negslope}(xp*scale + shift), w). The normalized,
    activated tensor z is never materialized in HBM — forward applies the
    prologue to the input slab in VMEM, and the backward's dw kernel
    recomputes it the same way. negslope=1.0 means affine-only (a BN with
    no activation, e.g. the post-concat BN before the up conv).

    xp: [B, Cin, Hp, Wp] pre-padded; scale/shift: [Cin] fp32 (computed in
    XLA from the BN statistics of the raw producer tensor)."""
    out = _conv_fwd_impl(xp, w.astype(xp.dtype), k, scale, shift, negslope)
    return out[:, :, :, :xp.shape[3] - k + 1]


def _convp_fwd(xp, w, scale, shift, k, negslope):
    return (conv_pro_valid_chw(xp, w, scale, shift, k, negslope),
            (xp, w, scale, shift))


def _convp_bwd(k, negslope, res, g):
    xp, w, scale, shift = res
    B, cin, hp, wp = xp.shape
    # dz: full correlation of g with the flipped, io-swapped kernel — the
    # plain conv backward; the prologue chain rule is applied elementwise
    # below (XLA fuses it into one pass over dz/xp).
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    gp = jnp.pad(g, ((0, 0), (0, 0), (k - 1, k - 1), (k - 1, k - 1)))
    dz = _conv_fwd_impl(gp.astype(xp.dtype), w_flip.astype(xp.dtype), k)
    dz = dz[:, :, :hp, :wp].astype(jnp.float32)
    sc = scale.astype(jnp.float32)[None, :, None, None]
    sh = shift.astype(jnp.float32)[None, :, None, None]
    x32 = xp.astype(jnp.float32)
    if negslope != 1.0:
        u = x32 * sc + sh
        du = dz * jnp.where(u >= 0, 1.0, negslope)
    else:
        du = dz
    dxp = (du * sc).astype(xp.dtype)
    dscale = jnp.sum(du * x32, axis=(0, 2, 3)).astype(scale.dtype)
    dshift = jnp.sum(du, axis=(0, 2, 3)).astype(shift.dtype)
    dw = _dw_impl(xp, g.astype(xp.dtype), k, scale, shift,
                  negslope).astype(w.dtype)
    return dxp, dw, dscale, dshift


conv_pro_valid_chw.defvjp(_convp_fwd, _convp_bwd)


def pallas_conv_bn_act_chw(x: jax.Array, p: dict, scale: jax.Array,
                           shift: jax.Array, stride: int = 1,
                           pad: str = "zero",
                           negslope: float = 0.2) -> jax.Array:
    """Fused BN-apply + activation + conv: conv(leaky(x*scale+shift)).

    Same padding/stride semantics as pallas_conv_chw. For stride 2 the
    space-to-depth phase decomposition applies; the per-channel prologue
    commutes with the phase permutation, so scale/shift are tiled 4x to
    match the phase-major channel layout."""
    w = p["kernel"]
    k, _, cin, cout = w.shape
    to_pad = (k - 1) // 2
    if to_pad > 0:
        if pad == "reflection":
            # reflect-pad commutes with the per-channel prologue.
            x = jnp.pad(x, ((0, 0), (0, 0), (to_pad, to_pad),
                            (to_pad, to_pad)), mode="reflect")
        else:
            # Zero padding must hold zeros OF Z (the normalized/activated
            # tensor), not prologue(0) = leaky(shift): pad with the
            # prologue's pre-image of zero, v = -shift/scale, so the
            # kernel's in-VMEM prologue maps the border to exactly 0.
            # Write v onto the border only (zero-pad + masked add) — the
            # earlier (x - v) + v round-trip quantized every INTERIOR
            # element in the compute dtype, which corrupts bf16 activations
            # whenever training drives |shift/scale| large.
            s = scale.astype(jnp.float32)
            v = -shift.astype(jnp.float32) / jnp.where(
                jnp.abs(s) < 1e-12, 1e-12, s)
            vb = v.astype(x.dtype)[None, :, None, None]
            border = jnp.pad(
                jnp.zeros(x.shape[2:], x.dtype),
                ((to_pad, to_pad), (to_pad, to_pad)), constant_values=1)
            x = jnp.pad(x, ((0, 0), (0, 0), (to_pad, to_pad),
                            (to_pad, to_pad))) + vb * border
    if stride == 1:
        out = conv_pro_valid_chw(x, w, scale, shift, k, negslope)
    elif stride == 2:
        B, _, hp, wp = x.shape
        ho = (hp - k) // 2 + 1
        wo = (wp - k) // 2 + 1
        k2 = (k + 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp % 2 + 2), (0, wp % 2 + 2)))
        hp2, wp2 = x.shape[2] // 2, x.shape[3] // 2
        xr = x.reshape(B, cin, hp2, 2, wp2, 2)
        s2d = xr.transpose(0, 3, 5, 1, 2, 4).reshape(B, 4 * cin, hp2, wp2)
        wk = jnp.zeros((k2, k2, 4, cin, cout), w.dtype)
        for dy in range(k):
            for dx in range(k):
                ph = (dy % 2) * 2 + (dx % 2)
                wk = wk.at[dy // 2, dx // 2, ph].set(w[dy, dx])
        wk = wk.reshape(k2, k2, 4 * cin, cout)
        out = conv_pro_valid_chw(s2d, wk, jnp.tile(scale, 4),
                                 jnp.tile(shift, 4), k2,
                                 negslope)[:, :, :ho, :wo]
    else:
        raise NotImplementedError(stride)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)[:, None, None]
    return out


def pallas_conv_chw(x: jax.Array, p: dict, stride: int = 1,
                    pad: str = "zero") -> jax.Array:
    """Drop-in replacement for unet.conv2d_chw using the Pallas kernel.

    x: [B, Cin, H, W]; p["kernel"]: [kh, kw, Cin, Cout] (torch (k-1)//2
    padding semantics). stride 2 uses the exact space-to-depth phase
    decomposition: each phase sees a ceil(k/2)-sized sub-kernel at stride 1.
    """
    w = p["kernel"]
    k, _, cin, cout = w.shape
    to_pad = (k - 1) // 2
    if to_pad > 0:
        mode = "reflect" if pad == "reflection" else "constant"
        x = jnp.pad(x, ((0, 0), (0, 0), (to_pad, to_pad), (to_pad, to_pad)),
                    mode=mode)
    if stride == 1:
        out = conv_valid_chw(x, w, k)
    elif stride == 2:
        # Space-to-depth: a stride-2 kxk conv is EXACTLY a stride-1
        # ceil(k/2)-sized conv over the depth-4 phase image with the taps
        # scattered into a [k2, k2, 4*Cin, Cout] kernel (tap (dy, dx)
        # lands in sub-position (dy//2, dx//2) of phase (dy%2, dx%2);
        # unused slots stay zero). The phase extraction is an even-pad +
        # reshape (cheap relayout — stride-2 slices would lower to XLA
        # gathers), and the single conv contracts K = k2*k2*4*Cin on the
        # MXU instead of accumulating 4 phase convs.
        B, _, hp, wp = x.shape
        ho = (hp - k) // 2 + 1
        wo = (wp - k) // 2 + 1
        k2 = (k + 1) // 2          # per-phase sub-kernel size
        # Each phase needs (k-1)//2 // 1 + ho rows; padding to even plus
        # one extra phase row/col covers every (dy//2, dx//2) shift.
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp % 2 + 2), (0, wp % 2 + 2)))
        hp2, wp2 = x.shape[2] // 2, x.shape[3] // 2
        xr = x.reshape(B, cin, hp2, 2, wp2, 2)
        # [B, py, px, cin, hp2, wp2] -> [B, 4*cin, hp2, wp2]
        s2d = xr.transpose(0, 3, 5, 1, 2, 4).reshape(B, 4 * cin, hp2, wp2)
        wk = jnp.zeros((k2, k2, 4, cin, cout), w.dtype)
        for dy in range(k):
            for dx in range(k):
                ph = (dy % 2) * 2 + (dx % 2)
                wk = wk.at[dy // 2, dx // 2, ph].set(w[dy, dx])
        wk = wk.reshape(k2, k2, 4 * cin, cout)
        out = conv_valid_chw(s2d, wk, k2)[:, :, :ho, :wo]
    else:
        raise NotImplementedError(stride)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)[:, None, None]
    return out
