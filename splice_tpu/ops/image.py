"""On-device image ops (XLA), replacing the reference's host-side PIL/torchvision
pipeline (reference data/transforms.py:7-41, util/losses.py:17-24).

Everything here runs inside the jitted train step: static output shapes, traced
randomness via explicit PRNG keys. Layout is NHWC (TPU-native), images are
float32/bfloat16 in [0, 1].
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)   # reference losses.py:19
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------

def dino_resize_shape(h: int, w: int, size: int = 224,
                      max_size: int = 480) -> Tuple[int, int]:
    """Output (H, W) of torchvision Resize(size, max_size=max_size).

    Shorter side -> `size`, aspect preserved; if the longer side would exceed
    `max_size`, scale so the longer side == max_size instead
    (reference util/losses.py:20 semantics).
    """
    short, long = (h, w) if h <= w else (w, h)
    # torchvision truncates (int(), not round()) in both branches —
    # F_pil.resize / _compute_resized_output_size.
    new_short, new_long = size, int(size * long / short)
    if max_size is not None and new_long > max_size:
        new_short = int(max_size * new_short / new_long)
        new_long = max_size
    nh, nw = (new_short, new_long) if h <= w else (new_long, new_short)
    return nh, nw


def resize(img: jax.Array, out_hw: Tuple[int, int],
           antialias: bool = True) -> jax.Array:
    """Bilinear resize, half-pixel centers (== PIL/torch align_corners=False).

    Works on [..., H, W, C].
    """
    *lead, h, w, c = img.shape
    out = jax.image.resize(img, (*lead, out_hw[0], out_hw[1], c),
                           method="bilinear", antialias=antialias)
    return out


def dino_global_resize(img: jax.Array, size: int = 224, max_size: int = 480,
                       antialias: bool = True) -> jax.Array:
    """The loss-side resize policy (reference losses.py:20) on NHWC tensors."""
    h, w = img.shape[-3], img.shape[-2]
    return resize(img, dino_resize_shape(h, w, size, max_size), antialias)


def imagenet_normalize(img: jax.Array) -> jax.Array:
    """ImageNet mean/std normalize (reference losses.py:19)."""
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


# ---------------------------------------------------------------------------
# Random crops on a static canvas
# ---------------------------------------------------------------------------

def crop_and_resize(img: jax.Array, top: jax.Array, left: jax.Array,
                    size: jax.Array, canvas: int,
                    antialias: bool = True) -> jax.Array:
    """Crop window [top:top+size, left:left+size] -> (canvas, canvas), bilinear.

    `top`/`left`/`size` may be traced floats — this is how we keep the
    reference's per-step random crop size (reference transforms.py:22-23)
    while every XLA shape stays static: the dynamic window is expressed as a
    traced scale/translation of `jax.image.scale_and_translate`.

    img: [H, W, C]; returns [canvas, canvas, C].

    Sampling near the window border reads the true neighboring image pixels;
    the image itself is edge-padded so windows touching the image border
    never bleed zeros (scale_and_translate pads with 0 beyond the array).
    This differs from literal crop-then-resize only by sub-pixel values in
    the outermost output row/column.
    """
    h, w, c = img.shape
    pad = 2
    imgp = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    size = jnp.asarray(size, jnp.float32)
    scale = canvas / size
    # scale_and_translate maps input coord x -> output coord y = scale*x + t
    # (half-pixel centers). We want input [top, top+size) -> output [0, canvas).
    ty = -(jnp.asarray(top, jnp.float32) + pad) * scale
    tx = -(jnp.asarray(left, jnp.float32) + pad) * scale
    # CHW internally: scale_and_translate is two dense [in, out]
    # contractions, and with the HWC layout (C=3 minor) every pass runs
    # at 3/128 lane utilization plus relayout copies (~0.9 ms/step in the
    # round-4 trace). With spatial dims minor the same contractions are
    # plain W-minor matmuls. Numerics identical (same op, same weights).
    out = jax.image.scale_and_translate(
        imgp.transpose(2, 0, 1), (c, canvas, canvas), (1, 2),
        jnp.stack([scale, scale]), jnp.stack([ty, tx]),
        method="bilinear", antialias=antialias)
    return out.transpose(1, 2, 0)


def global_crops(img: jax.Array, key: jax.Array, n_crops: int,
                 min_cover: float, canvas: int,
                 antialias: bool = True) -> jax.Array:
    """TPU-native Global_crops (reference data/transforms.py:7-27).

    One crop side is sampled per call: side = min(round(U(min_cover*H, H)), W)
    (square, clipped to width — reference transforms.py:21-23). All `n_crops`
    crops share that side and have independent positions, then land on a
    static `canvas`x`canvas` grid instead of keeping their dynamic size.

    img: [H, W, C] -> [n_crops, canvas, canvas, C].
    """
    h, w, _ = img.shape
    k_size, k_pos = jax.random.split(key)
    side = jnp.round(jax.random.uniform(k_size, (), jnp.float32,
                                        min_cover * h, float(h)))
    side = jnp.minimum(side, float(w))
    # RandomCrop: integer top-left, uniform over valid range.
    max_top = jnp.maximum(h - side, 0.0)
    max_left = jnp.maximum(w - side, 0.0)
    u = jax.random.uniform(k_pos, (n_crops, 2), jnp.float32)
    tops = jnp.floor(u[:, 0] * (max_top + 1.0))
    lefts = jnp.floor(u[:, 1] * (max_left + 1.0))
    fn = jax.vmap(lambda t, l: crop_and_resize(img, t, l, side, canvas,
                                               antialias))
    return fn(tops, lefts)


# ---------------------------------------------------------------------------
# Augmentations (reference data/transforms.py:30-41)
# ---------------------------------------------------------------------------

def random_hflip(img: jax.Array, key: jax.Array, p: float = 0.5) -> jax.Array:
    """RandomHorizontalFlip on [H, W, C]."""
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, img[:, ::-1, :], img)


def _rgb_to_grayscale(img: jax.Array) -> jax.Array:
    # ITU-R 601-2 luma, as PIL convert('L') / torchvision rgb_to_grayscale.
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(_rgb_to_grayscale(img))
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _rgb_to_grayscale(img)
    return jnp.clip((img - gray) * factor + gray, 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, delta):
    h, s, v = _rgb_to_hsv(img)
    return jnp.clip(_hsv_to_rgb((h + delta) % 1.0, s, v), 0.0, 1.0)


def color_jitter(img: jax.Array, key: jax.Array,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.2, hue: float = 0.1) -> jax.Array:
    """torchvision ColorJitter semantics: sample a factor per op, apply all
    four ops in a random order (reference transforms.py:31-35).
    """
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    order = jnp.argsort(jax.random.uniform(kperm, (4,)))

    def apply_op(i, im):
        op = order[i]
        return jax.lax.switch(op, [
            lambda x: adjust_brightness(x, fb),
            lambda x: adjust_contrast(x, fc),
            lambda x: adjust_saturation(x, fs),
            lambda x: adjust_hue(x, fh),
        ], im)

    return jax.lax.fori_loop(0, 4, apply_op, img)


def gaussian_blur3(img: jax.Array, sigma: jax.Array) -> jax.Array:
    """GaussianBlur(kernel_size=3) with traced sigma, reflect padding
    (torchvision semantics; reference transforms.py:36).  img: [H, W, C].

    Separable 3-tap blur as shifted ADDS, not depthwise convs: the NHWC
    conv form put C=3 on the minor (lane) axis — 3/128 lane utilization
    on every pass, ~3 ms/step at 900px (round-2 profile, which is why the
    callers grew lax.cond gates). Shift-add is pure elementwise work XLA
    fuses at whatever layout the producer already has (~0.1 ms), fp32
    throughout (bf16 multiplies band visibly on smooth gradients).
    """
    x = jnp.asarray([-1.0, 0.0, 1.0])
    k1 = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k1 = k1 / jnp.sum(k1)
    f = img.astype(jnp.float32)

    def tap3(t, axis):
        lo = jax.lax.slice_in_dim(t, 1, 2, axis=axis)        # reflect head
        hi = jax.lax.slice_in_dim(t, t.shape[axis] - 2,
                                  t.shape[axis] - 1, axis=axis)
        p = jnp.concatenate([lo, t, hi], axis=axis)
        n = t.shape[axis]
        return (k1[0] * jax.lax.slice_in_dim(p, 0, n, axis=axis)
                + k1[1] * jax.lax.slice_in_dim(p, 1, n + 1, axis=axis)
                + k1[2] * jax.lax.slice_in_dim(p, 2, n + 2, axis=axis))

    return tap3(tap3(f, 0), 1).astype(img.dtype)


def random_gaussian_blur3(img: jax.Array, key: jax.Array,
                          p: float = 0.2) -> jax.Array:
    """RandomApply(GaussianBlur(3), p) with sigma ~ U(0.1, 2.0)
    (torchvision default sigma range).

    Always compute-then-where: with the shift-add blur at ~0.1 ms the
    lax.cond form's full-image branch copies (~0.45 ms/step in the
    round-4 trace, paid on EVERY step) cost more than just blurring every
    step does. (A static_ctrl knob used to select lax.cond dispatch here;
    it was removed when the measurement flipped — the cond/where choice
    now exists only for the ColorJitter gate in structure_augment.)"""
    k_apply, k_sigma = jax.random.split(key)
    sigma = jax.random.uniform(k_sigma, (), minval=0.1, maxval=2.0)
    apply = jax.random.bernoulli(k_apply, p)
    return jnp.where(apply, gaussian_blur3(img, sigma), img)


def structure_augment(img: jax.Array, key: jax.Array,
                      static_ctrl: bool = True) -> jax.Array:
    """dino_structure_transforms (reference transforms.py:30-37):
    HFlip(0.5) -> ColorJitter(0.4,0.4,0.2,0.1)@p=0.5 -> GaussianBlur(3)@p=0.2.

    static_ctrl: True gates ColorJitter with lax.cond (the untaken branch
    is skipped under jit); False uses compute-then-where (needed under
    check_vma shard_map regions on jax 0.9.0, which trip a cond/vma
    unification bug; identical numerics, tested). The blur is always
    compute-then-where — see random_gaussian_blur3.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = random_hflip(img, k1)
    jitter_on = jax.random.bernoulli(k3, 0.5)
    if static_ctrl:
        img = jax.lax.cond(jitter_on,
                           lambda im: color_jitter(im, k2),
                           lambda im: im, img)
    else:
        img = jnp.where(jitter_on, color_jitter(img, k2), img)
    img = random_gaussian_blur3(img, k4)
    return img


def texture_augment(img: jax.Array, key: jax.Array) -> jax.Array:
    """dino_texture_transforms (reference transforms.py:39-41): HFlip(0.5)."""
    return random_hflip(img, key)


# ---------------------------------------------------------------------------
# Output conversion (reference util/util.py:42-59)
# ---------------------------------------------------------------------------

def tensor2im(img: jax.Array) -> jax.Array:
    """[H, W, C] float in [0,1] -> uint8 HWC (reference util.py:42-52)."""
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
