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

# Route stride-1 zero-pad convs through the SAME-border kernels (in-kernel
# masked lane-rolls, no horizontal pre-pad) instead of the VALID kernels
# on a 128-aligned pre-padded width. Ablation knob, measured e2e
# (PERFORMANCE.md). Round 4 measured SAME as part of a +1.35 bundle; the
# round-5 re-sweep AFTER the dw tap-on-N + CHW crop-contraction changes
# measures VALID faster (31.9 vs 31.6 steps/s, scripts/ablate.py
# nosamekern, two runs each), so the default flipped back — the mask
# multiplies' VPU time now exceeds what the 12.5% lane saving buys.
SAME_BORDER_KERNELS = False


# H-tile VMEM budget for the conv kernels (ablation knob, see
# scripts/ablate.py tb<MB>): bigger tiles amortize per-grid-cell entry
# overhead against VMEM pressure. 2 MB (round 1-3) -> 6 MB measured
# +0.1 steps/s e2e at the flagship workload (ablate tb6).
TILE_BUDGET_BYTES = 6 * 1024 * 1024


def _rows_per_tile(cin: int, cout: int, k: int, wp: int,
                   itemsize: int) -> int:
    """Pick the H-tile so slab + accumulator fit comfortably in VMEM."""
    budget = TILE_BUDGET_BYTES
    lanes = ((wp + 127) // 128) * 128
    per_row = (cin + cout) * lanes * itemsize + cout * lanes * 4
    rows = max(budget // max(per_row, 1), 8)
    rows = (rows // 8) * 8       # sublane-divisible tiles (Mosaic requires)
    return int(max(8, min(rows, 256)))


def _roll_left2d(xs, dx: int):
    """Lane-roll left by dx (dx may be negative = roll right) for a 2-D
    [rows, L] operand (axis 1)."""
    L = xs.shape[1]
    amt = (L - dx) % L
    if amt == 0:
        return xs
    if xs.dtype.itemsize == 4:
        return pltpu.roll(xs, amt, 1)
    if xs.shape[0] % 2 == 0:
        xi = pltpu.bitcast(xs, jnp.int32)
        return pltpu.bitcast(pltpu.roll(xi, amt, 1), xs.dtype)
    return pltpu.roll(xs.astype(jnp.float32), amt, 1).astype(xs.dtype)


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


def _flat_taps(flat, k: int, ht: int, wp: int, off0: int = 0,
               cmask_ref=None, mask_taps=None):
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

    SAME mode (off0 = -(k-1)//2, cmask_ref set): tap dx uses lane offset
    dx+off0 (negative = roll right), and each rolled slab is multiplied by
    its precomputed 0/1 column mask row cmask_ref[dx] ([1, L], broadcast
    over Cin) — zeroing (a) lanes the roll wrapped across a row boundary
    and (b) lanes whose input column lies outside the valid width w0.
    This replaces the horizontal zero-pre-pad entirely: a 896-wide image
    stays at 896 lanes instead of padding 898 -> 1024 (12.5% of HBM
    traffic and MXU time at every large U-Net site). mask_taps[dx] skips
    the multiply where the mask is statically all-ones.
    """
    rolled = [_roll_left2d(flat, dx + off0) for dx in range(k)]
    if cmask_ref is not None:
        rolled = [r * cmask_ref[dx:dx + 1, :] if mask_taps[dx] else r
                  for dx, r in enumerate(rolled)]
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
                      negslope: float, off0: int = 0,
                      mask_taps: Optional[Tuple[bool, ...]] = None,
                      stats_ho: int = 0, stats_colmask: bool = False):
    """Forward conv kernel over one [1, Cin, ht, Wp] block.

    kpack: stack the k*k shifted taps into ONE [k*k*Cin, ht*Wp] operand so
    the whole conv is a single MXU dot with contraction depth k*k*Cin
    instead of k*k skinny K=Cin dots (the systolic array runs at K/128
    utilization — 9 taps of K=16 waste 7/8 of every pass).
    has_pro: two extra [Cin, 1] fp32 refs (scale, shift) — deferred-BN
    affine + LeakyReLU(negslope) applied to the slab in VMEM.
    off0/mask_taps: SAME-mode tap offsets + column masks (see _flat_taps);
    mask_taps non-None adds a [k, L] mask ref after the weight ref.
    stats_ho > 0: additionally emit per-channel (sum, sum-of-squares) of
    the CAST output over the valid region — the consumer BatchNorm's
    statistics — accumulated across grid cells into a second [2, Cout]
    f32 output. The stats read the output while it is still in VMEM,
    replacing a full HBM re-read by the XLA reduction (profiled
    ~1.5 ms/step across the pend() sites at the flagship workload).
    stats_ho is the valid output row count (garbage tile-fill rows are
    masked dynamically). stats_colmask: when w0 < Wp, a [1, ht*Wp] 0/1
    ref masking output COLUMNS >= w0 out of the stats — those columns
    are NOT all zero (edge taps legitimately reach input col w0-1) and
    are normally sliced off by the caller."""
    has_cmask = mask_taps is not None and any(mask_taps)

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        halo_ref = refs.pop(0)
        w_ref = refs.pop(0)
        cmask_ref = refs.pop(0) if has_cmask else None
        if has_pro:
            s_ref, t_ref = refs.pop(0), refs.pop(0)
            pro = (s_ref, t_ref, negslope)
        else:
            pro = None
        scol_ref = None
        if stats_ho:
            if stats_colmask:
                scol_ref = refs.pop(0)
            o_ref, st_ref, acc_ref, stacc_ref = refs
        else:
            o_ref, acc_ref = refs
        cin = x_ref.shape[1]
        cout = o_ref.shape[1]
        wp = x_ref.shape[3]
        flat = _flat_slab(x_ref[0], halo_ref[0, 0] if k > 1 else None, k,
                          ht, wp, pro)
        taps = _flat_taps(flat, k, ht, wp, off0, cmask_ref, mask_taps)
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
        o_cast = acc_ref[:].reshape(cout, ht, wp).astype(o_ref.dtype)
        o_ref[0] = o_cast
        if stats_ho:
            b = pl.program_id(0)
            i = pl.program_id(1)

            @pl.when(jnp.logical_and(b == 0, i == 0))
            def _():
                stacc_ref[:] = jnp.zeros_like(stacc_ref)

            # Stats of the CAST value (matching what the XLA reduction
            # would read back), valid rows only.
            r_valid = jnp.clip(stats_ho - i * ht, 0, ht)
            row = jax.lax.broadcasted_iota(jnp.int32, (1, ht * wp), 1)
            keep = (row < r_valid * wp).astype(jnp.float32)
            if scol_ref is not None:
                keep = keep * scol_ref[...]
            of = o_cast.reshape(cout, ht * wp).astype(jnp.float32) * keep
            stacc_ref[0, :] += jnp.sum(of, axis=1)
            stacc_ref[1, :] += jnp.sum(of * of, axis=1)
            last = jnp.logical_and(b == pl.num_programs(0) - 1,
                                   i == pl.num_programs(1) - 1)

            @pl.when(last)
            def _():
                st_ref[:] = stacc_ref[:]

    return kernel


def _same_col_masks(k: int, wp: int, w0: int, L: int, dtype,
                    off0: Optional[int] = None):
    """[k, L] 0/1 lane masks + per-tap needed flags.

    Rolled-slab lane c of tap dx (offset o = dx + off0, default SAME
    off0 = -(k-1)//2) holds input column (c % wp) + o; the mask is 1 iff
    that column is inside the valid width [0, w0) — zeroing both the
    roll's row-boundary wrap and any lane-alignment padding columns
    (which, under the fused prologue, are NOT zero after
    normalize+activate). The VALID-mode gtap dw passes off0=0 and
    w0=wp: only the roll wraps need killing there (every real column is
    valid; see _dw_gtap_impl)."""
    p = -off0 if off0 is not None else (k - 1) // 2
    col = jnp.arange(L, dtype=jnp.int32) % wp
    rows, needed = [], []
    for dx in range(k):
        o = dx - p
        needed.append(o != 0 or w0 < wp)
        valid = jnp.logical_and(col + o >= 0, col + o < w0)
        rows.append(valid.astype(dtype))
    if not any(needed):
        return None, tuple(needed)
    return jnp.stack(rows, 0), tuple(needed)


def _conv_fwd_impl(xp: jax.Array, w: jax.Array, k: int,
                   scale: Optional[jax.Array] = None,
                   shift: Optional[jax.Array] = None,
                   negslope: float = 0.2, same: bool = False,
                   want_stats: bool = False):
    """xp: [B, Cin, Hp, Wp] pre-padded; w: [k, k, Cin, Cout].
    Returns [B, Cout, Hp-k+1, Wp]; only the first Wp-k+1 columns are valid
    (caller slices). scale/shift [Cin]: optional fused input prologue
    z = leaky_{negslope}(x*scale + shift) (deferred BatchNorm apply).

    same=True: xp is row-padded ONLY ((k-1)//2 rows top+bottom); all Wp
    input columns are valid and the output has zero-border SAME width Wp
    (caller slices lane alignment off). Horizontal borders come from
    in-kernel masked lane-rolls (_same_col_masks) instead of a physical
    pre-pad — a 896-wide image would otherwise pad 898 -> 1024 lanes.

    Prologue + lane/row zero-padding is safe: padded columns are never
    read by a valid output (VALID: taps reach at most col Wp0-1; SAME:
    masked in-kernel), and padded rows only feed outputs >= ho, which are
    sliced off."""
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
    off0, cmask, mask_taps = 0, None, None
    if same:
        off0 = -(k - 1) // 2
        L = (ht + k - 1) * wp
        cmask, mask_taps = _same_col_masks(k, wp, wp0, L, xp.dtype)
    if want_stats:
        assert same, "in-kernel stats require the SAME path (masked cols)"
    stats_colmask = want_stats and wp0 < wp
    kernel = _make_conv_kernel(k, ht, kpack, has_pro, negslope, off0,
                               mask_taps if cmask is not None else None,
                               stats_ho=ho if want_stats else 0,
                               stats_colmask=stats_colmask)
    in_specs = [
        pl.BlockSpec((1, cin, ht, wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin, max(k - 1, 1), wp),
                     lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        wspec,
    ]
    args = [xp[:, :, :n_tiles * ht, :], halo, wk]
    if cmask is not None:
        in_specs.append(pl.BlockSpec(cmask.shape, lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cmask)
    if has_pro:
        vec = pl.BlockSpec((cin, 1), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)
        in_specs += [vec, vec]
        args += [scale.reshape(cin, 1).astype(jnp.float32),
                 shift.reshape(cin, 1).astype(jnp.float32)]
    if stats_colmask:
        colv = (jnp.arange(ht * wp, dtype=jnp.int32) % wp
                < wp0).astype(jnp.float32)[None, :]
        in_specs.append(pl.BlockSpec((1, ht * wp), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(colv)
    interpret = jax.default_backend() == "cpu"
    out_shape = jax.ShapeDtypeStruct((B, cout, n_tiles * ht, wp), xp.dtype)
    out_specs = pl.BlockSpec((1, cout, ht, wp), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((cout, ht * wp), jnp.float32)]
    if want_stats:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((2, cout), jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec((2, cout), lambda b, i: (0, 0),
                                  memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((2, cout), jnp.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * k * k * cin * cout * ho * wp,
            bytes_accessed=(B * cin * hp * wp + B * cout * ho * wp)
            * xp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    if want_stats:
        out, st = out
        return out[:, :, :ho, :], st[0], st[1]
    return out[:, :, :ho, :]


def _make_dw_kernel(k: int, ht: int, has_pro: bool, negslope: float,
                    off0: int = 0,
                    mask_taps: Optional[Tuple[bool, ...]] = None):
    """Accumulate dw[k*k*Cin, Cout] over grid tiles: ONE tap-packed
    [k*k*Cin, ht*Wp] x [ht*Wp, Cout] dot per tile instead of k*k skinny
    M=Cin dots — ceil(k*k*Cin/128) MXU output tiles stream the pixel
    contraction once, vs k*k separate streams. has_pro: the fused-conv
    backward recomputes z = leaky(x*scale+shift) on the slab in VMEM (z
    is never materialized in HBM). off0/mask_taps: SAME-mode tap offsets
    + column masks (see _flat_taps)."""
    has_cmask = mask_taps is not None and any(mask_taps)

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        halo_ref = refs.pop(0)
        g_ref = refs.pop(0)
        cmask_ref = refs.pop(0) if has_cmask else None
        if has_pro:
            s_ref, t_ref = refs.pop(0), refs.pop(0)
            pro = (s_ref, t_ref, negslope)
        else:
            pro = None
        dw_ref, acc_ref = refs
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
        taps = _flat_taps(flat, k, ht, wp, off0, cmask_ref, mask_taps)
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


def _make_dw_kernel_gtap(k: int, ht: int, has_pro: bool, negslope: float,
                         off0: int, mask_taps: Optional[Tuple[bool, ...]],
                         zmask: bool):
    """Tap-on-N dw kernel: accumulate dw as [Cin, k*k*Cout] by tapping the
    COTANGENT instead of the input.

    The standard dw dot ([k*k*Cin, P] x [P, Cout]) is MXU pass-bound:
    passes = ceil(k*k*Cin/128) * ceil(Cout/128), and the N=Cout dimension
    wastes 1 - Cout/128 of the array (flagship up_conv site: Cin=36,
    Cout=16 -> 3 x 1 = 3 passes at N=16/128 utilization). Swapping roles —
    dw[dy,dx,ci,co] = sum_rr z[ci,rr,c] * g[co,rr-dy,c-(dx+off0)] — makes
    the dot [Cin, P] x [P, k*k*Cout]: ceil(Cin/128) * ceil(k*k*Cout/128)
    passes (up_conv: 1 x 2 = 2, -33% MXU time). Tap reversal: the SAME tap
    machinery applied to the top-(k-1)-padded g gives tap (dy', dx') =
    term (k-1-dy, k-1-dx); _dw_impl flips the reshaped output.

    zmask: a [1, ht*Wp] 0/1 ref zeroing z's lane-padding columns >= w0 —
    under the fused prologue those hold leaky(shift) != 0, and unlike the
    x-tapped form nothing else masks them out of the contraction.
    """
    has_cmask = mask_taps is not None and any(mask_taps)

    def kernel(*refs):
        refs = list(refs)
        z_ref = refs.pop(0)
        g_ref = refs.pop(0)
        ghalo_ref = refs.pop(0)
        cmask_ref = refs.pop(0) if has_cmask else None
        zmask_ref = refs.pop(0) if zmask else None
        if has_pro:
            s_ref, t_ref = refs.pop(0), refs.pop(0)
        dw_ref, acc_ref = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        cin = z_ref.shape[1]
        cout = g_ref.shape[1]
        wp = z_ref.shape[3]

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        z = z_ref[0].reshape(cin, ht * wp)
        if has_pro:
            zf = z.astype(jnp.float32) * s_ref[...] + t_ref[...]
            if negslope != 1.0:
                zf = jnp.where(zf >= 0, zf, zf * negslope)
            z = zf.astype(z.dtype)
        if zmask_ref is not None:
            z = z * zmask_ref[...]
        gflat = _flat_slab(g_ref[0], ghalo_ref[0, 0] if k > 1 else None,
                           k, ht, wp)
        gtaps = _flat_taps(gflat, k, ht, wp, off0, cmask_ref, mask_taps)
        big = jnp.stack(gtaps, axis=0).reshape(k * k * cout, ht * wp)
        acc_ref[:] += jax.lax.dot_general(
            z, big, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Cin, k*k*Cout]
        last = jnp.logical_and(b == pl.num_programs(0) - 1,
                               i == pl.num_programs(1) - 1)

        @pl.when(last)
        def _():
            dw_ref[:] = acc_ref[:].astype(dw_ref.dtype)

    return kernel


def _dw_gtap_impl(xp: jax.Array, g: jax.Array, k: int,
                  scale: Optional[jax.Array],
                  shift: Optional[jax.Array],
                  negslope: float, same: bool = True) -> jax.Array:
    """Tap-on-N dw: grid over xp's row-padded rows, g tapped with
    reversed offsets. See _make_dw_kernel_gtap.

    same=False (VALID mode, round 5): xp is FULLY pre-padded (rows and
    columns), g is the valid [B, Cout, Ho, Wo] cotangent.
    dw[dy,dx,ci,co] = sum_{r,c} z[ci,r,c] * g[co, r-dy, c-dx], so g is
    zero-padded k-1 on top AND left and tap (dy', dx') = (k-1-dy, k-1-dx)
    rolls left by dx' >= 0 (off0 = 0). The only masking needed is the
    roll's row-boundary wrap (w0 = wp in _same_col_masks): every real
    column is valid, and z columns beyond wp0 multiply gp2's zero
    right-padding. This restores the round-4 tap-on-N pass reduction
    (up_conv 36->16: 3 MXU passes -> 2) on the VALID default path —
    the routing was silently lost when SAME_BORDER_KERNELS flipped off."""
    B, cin, hp, wp0 = xp.shape
    cout = g.shape[1]
    ho = hp - k + 1
    wp = ((wp0 + 127) // 128) * 128
    if wp > wp0:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - wp0)))
    ht = min(_rows_per_tile(cout, cin, k, wp, xp.dtype.itemsize), hp)
    n_tiles = pl.cdiv(hp, ht)
    if n_tiles * ht > hp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, n_tiles * ht - hp), (0, 0)))
    # gp2[rr + dy'] = g[rr - (k-1-dy')]: top-pad k-1 rows; bottom-pad to
    # the slab need (tile rows + k-1 halo rows).
    L = (ht + k - 1) * wp
    if same:
        gp2 = jnp.pad(g, ((0, 0), (0, 0), (k - 1, n_tiles * ht - ho),
                          (0, wp - g.shape[3])))
        off0 = -(k - 1) // 2
        cmask, mask_taps = _same_col_masks(k, wp, wp0, L, xp.dtype)
        zmask = wp0 < wp
    else:
        gp2 = jnp.pad(g, ((0, 0), (0, 0), (k - 1, n_tiles * ht - ho),
                          (k - 1, wp - (k - 1) - g.shape[3])))
        off0 = 0
        cmask, mask_taps = _same_col_masks(k, wp, wp, L, xp.dtype, off0=0)
        zmask = False
    ghalo = _halo(gp2, ht, n_tiles, k)
    has_pro = scale is not None
    kernel = _make_dw_kernel_gtap(
        k, ht, has_pro, negslope, off0,
        mask_taps if cmask is not None else None, zmask)
    in_specs = [
        pl.BlockSpec((1, cin, ht, wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout, ht, wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cout, max(k - 1, 1), wp),
                     lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, gp2[:, :, :n_tiles * ht, :], ghalo]
    if cmask is not None:
        in_specs.append(pl.BlockSpec(cmask.shape, lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cmask)
    if zmask:
        zm = (jnp.arange(ht * wp, dtype=jnp.int32) % wp
              < wp0).astype(xp.dtype)[None, :]
        in_specs.append(pl.BlockSpec((1, ht * wp), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(zm)
    if has_pro:
        vec = pl.BlockSpec((cin, 1), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)
        in_specs += [vec, vec]
        args += [scale.reshape(cin, 1).astype(jnp.float32),
                 shift.reshape(cin, 1).astype(jnp.float32)]
    interpret = jax.default_backend() == "cpu"
    dw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cin, k * k * cout), jnp.float32),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cin, k * k * cout), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cin, k * k * cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    # [Cin, k*k*Cout] tap-major (dy', dx') -> [k, k, Cin, Cout] with the
    # tap reversal dy = k-1-dy', dx = k-1-dx'.
    dw = dw.reshape(cin, k, k, cout).transpose(1, 2, 0, 3)
    return dw[::-1, ::-1]


def _gtap_better(k: int, cin: int, cout: int) -> bool:
    """Pick the dw form with fewer MXU output-tile passes (ties keep the
    x-tapped form — it skips the z lane mask and has the larger install
    base)."""
    xtap = -(-(k * k * cin) // 128) * -(-cout // 128)
    gtap = -(-cin // 128) * -(-(k * k * cout) // 128)
    return gtap < xtap


# Route dw (both SAME and VALID modes) through the tap-on-N kernel where
# it reduces MXU passes (see _make_dw_kernel_gtap). Ablation knob,
# measured e2e (PERFORMANCE.md).
DW_TAP_ON_N = True


def _dw_impl(xp: jax.Array, g: jax.Array, k: int,
             scale: Optional[jax.Array] = None,
             shift: Optional[jax.Array] = None,
             negslope: float = 0.2, same: bool = False) -> jax.Array:
    """dw for the VALID conv on pre-padded xp. g: [B, Cout, Ho, Wo];
    returns [k, k, Cin, Cout] fp32. scale/shift: fused input prologue
    (see _conv_fwd_impl). same=True: xp is row-padded only; horizontal
    borders come from the in-kernel masked rolls (see _conv_fwd_impl)."""
    B, cin, hp, wp0 = xp.shape
    cout = g.shape[1]
    # Tap-on-N routes the SAME path only. The VALID-mode gtap
    # (_dw_gtap_impl same=False) is implemented, correct, and unit-tested
    # — and a MEASURED NEGATIVE e2e (round 5, 200-step ablations, two
    # runs each): both big sites on gtap 31.59 steps/s, only the 5->3
    # pass [612,32] site 31.87, x-tap everywhere 31.97. The pass saving
    # the trace predicted is eaten by tapping/rolling the big g slab and
    # the extra cotangent pad; see PERFORMANCE.md negative results.
    if same and k > 1 and DW_TAP_ON_N and _gtap_better(k, cin, cout):
        return _dw_gtap_impl(xp, g, k, scale, shift, negslope, same=same)
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
    off0, cmask, mask_taps = 0, None, None
    if same:
        off0 = -(k - 1) // 2
        L = (ht + k - 1) * wp
        cmask, mask_taps = _same_col_masks(k, wp, wp0, L, xp.dtype)
    kernel = _make_dw_kernel(k, ht, has_pro, negslope, off0,
                             mask_taps if cmask is not None else None)
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
    if cmask is not None:
        in_specs.append(pl.BlockSpec(cmask.shape, lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cmask)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_same_chw(xp: jax.Array, w: jax.Array, k: int) -> jax.Array:
    """SAME zero-border k x k stride-1 conv on ROW-pre-padded CHW input
    via the Pallas kernel. xp: [B, Cin, H + k - 1, W] (rows padded by
    (k-1)//2 top+bottom, columns NOT padded); w: [k, k, Cin, Cout] ->
    [B, Cout, H, W]. Horizontal zero borders are produced in-kernel by
    masked lane-rolls, so a lane-aligned W (e.g. the 896-wide crop
    canvas) never pays the 898 -> 1024 pad-to-128 blowup of the VALID
    path."""
    out = _conv_fwd_impl(xp, w.astype(xp.dtype), k, same=True)
    return out[:, :, :, :xp.shape[3]]


def _conv_same_fwd(xp, w, k):
    return conv_same_chw(xp, w, k), (xp, w)


def _conv_same_bwd(k, res, g):
    xp, w = res
    # dx: FULL correlation vertically (the cotangent covers xp's pad
    # rows too — the caller's row-pad transpose slices them), SAME
    # horizontally.
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    gp = jnp.pad(g, ((0, 0), (0, 0), (k - 1, k - 1), (0, 0)))
    dx = _conv_fwd_impl(gp.astype(xp.dtype), w_flip.astype(xp.dtype), k,
                        same=True)
    dx = dx[:, :, :, :xp.shape[3]]
    dw = _dw_impl(xp, g.astype(xp.dtype), k, same=True).astype(w.dtype)
    return dx.astype(xp.dtype), dw


conv_same_chw.defvjp(_conv_same_fwd, _conv_same_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_same_pro_chw(xp: jax.Array, w: jax.Array, scale: jax.Array,
                      shift: jax.Array, k: int,
                      negslope: float) -> jax.Array:
    """SAME-border variant of conv_pro_valid_chw (deferred-BN prologue
    fused into the conv's input read). xp: [B, Cin, H + k - 1, W],
    row-padded with the prologue's zero pre-image v = -shift/scale on
    the (k-1)//2 border rows (so the in-kernel prologue maps them to
    exactly 0); horizontal zero borders of the NORMALIZED tensor come
    from the in-kernel column masks, which apply AFTER the prologue —
    no v-columns needed."""
    out = _conv_fwd_impl(xp, w.astype(xp.dtype), k, scale, shift,
                         negslope, same=True)
    return out[:, :, :, :xp.shape[3]]


def _convp_same_fwd(xp, w, scale, shift, k, negslope):
    return (conv_same_pro_chw(xp, w, scale, shift, k, negslope),
            (xp, w, scale, shift))


def _convp_same_bwd(k, negslope, res, g):
    xp, w, scale, shift = res
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    gp = jnp.pad(g, ((0, 0), (0, 0), (k - 1, k - 1), (0, 0)))
    dz = _conv_fwd_impl(gp.astype(xp.dtype), w_flip.astype(xp.dtype), k,
                        same=True)
    dz = dz[:, :, :, :xp.shape[3]].astype(jnp.float32)
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
    dw = _dw_impl(xp, g.astype(xp.dtype), k, scale, shift, negslope,
                  same=True).astype(w.dtype)
    return dxp, dw, dscale, dshift


conv_same_pro_chw.defvjp(_convp_same_fwd, _convp_same_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_same_pro_stats_chw(xp: jax.Array, w: jax.Array, scale: jax.Array,
                            shift: jax.Array, k: int, negslope: float):
    """conv_same_pro_chw that ALSO returns the per-channel fp32
    (sum, sum-of-squares) of its output over the valid region — the
    consumer BatchNorm's statistics, computed while the output tile is
    still in VMEM instead of re-read from HBM by an XLA reduction.
    Returns (out [B,Cout,H,W], s1 [Cout], s2 [Cout])."""
    out, s1, s2 = _conv_fwd_impl(xp, w.astype(xp.dtype), k, scale, shift,
                                 negslope, same=True, want_stats=True)
    return out[:, :, :, :xp.shape[3]], s1, s2


def _convp_same_stats_fwd(xp, w, scale, shift, k, negslope):
    out, s1, s2 = conv_same_pro_stats_chw(xp, w, scale, shift, k, negslope)
    return (out, s1, s2), (xp, w, scale, shift, out)


def _convp_same_stats_bwd(k, negslope, res, cts):
    """The stats are (mathematically) plain reductions of `out`:
    d s1/d out = 1, d s2/d out = 2*out. Fold their cotangents into the
    output cotangent, then delegate to the stats-free backward."""
    xp, w, scale, shift, out = res
    g_out, g_s1, g_s2 = cts
    g = (g_out.astype(jnp.float32)
         + g_s1[None, :, None, None]
         + 2.0 * out.astype(jnp.float32) * g_s2[None, :, None, None]
         ).astype(g_out.dtype)
    return _convp_same_bwd(k, negslope, (xp, w, scale, shift), g)


conv_same_pro_stats_chw.defvjp(_convp_same_stats_fwd,
                               _convp_same_stats_bwd)


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
                           negslope: float = 0.2,
                           want_stats: bool = False):
    """Fused BN-apply + activation + conv: conv(leaky(x*scale+shift)).

    Same padding/stride semantics as pallas_conv_chw. For stride 2 the
    space-to-depth phase decomposition applies; the per-channel prologue
    commutes with the phase permutation, so scale/shift are tiled 4x to
    match the phase-major channel layout.

    want_stats: additionally return the output's per-channel fp32
    (sum, sum-of-squares) over B, H, W — the consumer BatchNorm's
    statistics. On the SAME kernel path they are computed in-kernel while
    the output tile is in VMEM (no HBM re-read); elsewhere by an XLA
    reduction. Returns (out, s1, s2) instead of out."""
    w = p["kernel"]
    k, _, cin, cout = w.shape
    to_pad = (k - 1) // 2
    # k must be odd: the SAME kernels return width W, but for even k the
    # torch (k-1)//2-pad VALID semantics this function mirrors return W-1.
    if (to_pad > 0 and pad != "reflection" and stride == 1
            and k % 2 == 1 and SAME_BORDER_KERNELS):
        # SAME path: rows only carry a physical border (the prologue's
        # zero pre-image v = -shift/scale, so the in-VMEM prologue maps
        # them to exactly 0); horizontal zero borders of the normalized
        # tensor come from the kernel's post-prologue column masks — no
        # width pre-pad, no 898 -> 1024 lane blowup.
        s = scale.astype(jnp.float32)
        v = -shift.astype(jnp.float32) / jnp.where(
            jnp.abs(s) < 1e-12, 1e-12, s)
        vrows = jnp.broadcast_to(
            v.astype(x.dtype)[None, :, None, None],
            (x.shape[0], cin, to_pad, x.shape[3]))
        xr = jnp.concatenate([vrows, x, vrows], axis=2)
        if want_stats:
            out, s1, s2 = conv_same_pro_stats_chw(xr, w, scale, shift, k,
                                                  negslope)
            if "bias" in p:
                b32 = p["bias"].astype(jnp.float32)
                n = out.shape[0] * out.shape[2] * out.shape[3]
                # stats of (out + b): algebraic shift, no extra pass
                s2 = s2 + 2.0 * b32 * s1 + n * jnp.square(b32)
                s1 = s1 + n * b32
                out = out + p["bias"].astype(out.dtype)[:, None, None]
            return out, s1, s2
        out = conv_same_pro_chw(xr, w, scale, shift, k, negslope)
        if "bias" in p:
            out = out + p["bias"].astype(out.dtype)[:, None, None]
        return out
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
    if want_stats:
        o32 = out.astype(jnp.float32)
        return (out, jnp.sum(o32, axis=(0, 2, 3)),
                jnp.sum(jnp.square(o32), axis=(0, 2, 3)))
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
    # k % 2 == 1: see pallas_conv_bn_act_chw — even k would change widths.
    if (to_pad > 0 and pad != "reflection" and stride == 1
            and k % 2 == 1 and SAME_BORDER_KERNELS):
        # SAME path: physical pad on rows only; horizontal zero borders
        # come from the kernel's masked lane-rolls (no width pre-pad).
        x = jnp.pad(x, ((0, 0), (0, 0), (to_pad, to_pad), (0, 0)))
        out = conv_same_chw(x, w, k)
        if "bias" in p:
            out = out + p["bias"].astype(out.dtype)[:, None, None]
        return out
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
