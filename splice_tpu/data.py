"""Single-image-pair data layer.

Host responsibilities shrink to: decode the two images ONCE, optional
shorter-side pre-resize, direction swap, compute static canvas geometry, and
push both images to device (reference data/Dataset.py:12-73 re-runs PIL
augmentation + random crops on the host EVERY step; here per-step cropping/
augmentation happens on device inside the jitted step, see
splice_tpu/trainer.py and splice_tpu/ops/image.py).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def load_image(path: str, shorter_side: Optional[int] = None) -> np.ndarray:
    """Decode to float32 [0,1] HWC RGB; optional shorter-side resize
    (torchvision Resize(int) semantics, reference Dataset.py:47-51)."""
    img = Image.open(path).convert("RGB")
    if shorter_side is not None and shorter_side > 0:
        w, h = img.size
        # torchvision truncates the scaled long side (int(), not round())
        if h <= w:
            nh, nw = shorter_side, int(shorter_side * w / h)
        else:
            nh, nw = int(shorter_side * h / w), shorter_side
        img = img.resize((nw, nh), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff")


def first_image_in(dir_path: str) -> str:
    """First image file (sorted) — skips hidden files and non-image
    dirents like .ipynb_checkpoints/ or .DS_Store, which sort first."""
    names = sorted(
        n for n in os.listdir(dir_path)
        if not n.startswith(".") and n.lower().endswith(_IMAGE_EXTS)
        and os.path.isfile(os.path.join(dir_path, n)))
    if not names:
        raise FileNotFoundError(f"no images in {dir_path}")
    return os.path.join(dir_path, names[0])


def crop_canvas_size(h: int, w: int, requested: int = 0,
                     multiple: int = 32) -> int:
    """Static square canvas side for the global crops.

    The reference keeps each crop at its sampled dynamic size (reference
    transforms.py:22-23); we land crops on a static canvas so XLA compiles
    once. Auto policy: min(H, W) rounded down to a multiple of 32 (5 stride-2
    scales divide evenly -> no center-crop trims inside the U-Net).

    (Measured negative: a 128m-8 canvas (888) to absorb the 3x3 convs' +2
    border inside the conv kernel's 128-lane alignment benched 29.9 vs 30.1
    steps/s at 896 — the Pallas lane saving was outweighed by every XLA
    elementwise/reduction op losing its exact 7x128-lane minor dim. The
    lane-alignment problem is instead solved in-kernel: the SAME-mode conv
    masks the roll wraparound lanes so no horizontal pre-pad exists at all;
    see ops/conv_pallas.py.)
    """
    if requested > 0:
        return requested
    side = min(h, w)
    return max((side // multiple) * multiple, multiple)


@dataclasses.dataclass
class ImagePair:
    """A structure/appearance pair resident on device."""
    A: jax.Array           # [Ha, Wa, 3] float32 [0,1]
    B: jax.Array           # [Hb, Wb, 3]
    canvas_A: int          # static crop canvas side for A crops
    canvas_B: int

    @property
    def a_hw(self) -> Tuple[int, int]:
        return self.A.shape[0], self.A.shape[1]

    @property
    def b_hw(self) -> Tuple[int, int]:
        return self.B.shape[0], self.B.shape[1]


def load_pair(cfg, dataroot: Optional[str] = None) -> ImagePair:
    """reference SingleImageDataset init semantics (Dataset.py:39-56):
    first file in <dataroot>/{A,B}, optional resizes, BtoA swap."""
    root = dataroot or cfg.dataroot
    a_np = load_image(first_image_in(os.path.join(root, "A")), cfg.A_resize)
    b_np = load_image(first_image_in(os.path.join(root, "B")), cfg.B_resize)
    if cfg.direction == "BtoA":
        a_np, b_np = b_np, a_np
    ca = crop_canvas_size(a_np.shape[0], a_np.shape[1], cfg.crop_canvas)
    cb = crop_canvas_size(b_np.shape[0], b_np.shape[1], cfg.crop_canvas)
    # One shared canvas: lets the trainer run the A-crop and B-crop
    # generator passes as a single vmapped batch (bigger convs, half the
    # kernel dispatches) while BatchNorm stats stay per-stack.
    ca = cb = min(ca, cb)
    return ImagePair(A=jnp.asarray(a_np), B=jnp.asarray(b_np),
                     canvas_A=ca, canvas_B=cb)


def load_video_frames(cfg, dataroot: Optional[str] = None):
    """Video mode (BASELINE.json config 4): every file in <dataroot>/A is a
    frame; B is the single appearance image. Yields (frame_name, ImagePair)."""
    root = dataroot or cfg.dataroot
    b_np = load_image(first_image_in(os.path.join(root, "B")), cfg.B_resize)
    # B is shared by every frame: upload it to the device ONCE (a fresh
    # jnp.asarray per frame re-sent ~13 MB through the remote-TPU tunnel
    # between frames).
    b_dev = jnp.asarray(b_np)
    cb = crop_canvas_size(b_np.shape[0], b_np.shape[1], cfg.crop_canvas)
    a_dir = os.path.join(root, "A")
    frames = sorted(
        n for n in os.listdir(a_dir)
        if not n.startswith(".") and n.lower().endswith(_IMAGE_EXTS)
        and os.path.isfile(os.path.join(a_dir, n)))
    for name in frames:
        a_np = load_image(os.path.join(a_dir, name), cfg.A_resize)
        ca = crop_canvas_size(a_np.shape[0], a_np.shape[1], cfg.crop_canvas)
        # Same canvas-unification as load_pair: equal crop canvases let the
        # step batch the A/B generator passes in one vmapped call.
        yield name, ImagePair(A=jnp.asarray(a_np), B=b_dev,
                              canvas_A=min(ca, cb), canvas_B=min(ca, cb))
