"""Output-quality evaluation: PSNR / SSIM / LPIPS between two images.

The acceptance hook for transfer quality (SURVEY.md §4 item 4, BASELINE.md
protocol step 1: LPIPS <= 0.05 vs reference outputs). PSNR and SSIM (Wang
et al. 2004, 11x11 Gaussian window, K1=0.01, K2=0.03) work offline; LPIPS
needs AlexNet + linear-head weights, which cannot be downloaded in a
zero-egress environment — supply them as an .npz via --weights (see
`port_lpips_weights` below for producing that file from locally available
torch checkpoints).

CLI:
    python -m splice_tpu.tools.evaluate --a out/output.png --b ref.png \
        [--metric lpips --weights lpips_alex.npz]
prints one JSON line {"psnr": ..., "ssim": ...[, "lpips": ...]}.
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB. a, b: float arrays in [0, 1]."""
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    w = np.outer(g, g)
    return w / w.sum()


def _filter2(img: np.ndarray, win: np.ndarray) -> np.ndarray:
    """Valid-mode 2-D correlation of [H, W] with the window."""
    k = win.shape[0]
    H, W = img.shape
    out = np.zeros((H - k + 1, W - k + 1), np.float64)
    for dy in range(k):
        for dx in range(k):
            out += win[dy, dx] * img[dy:dy + H - k + 1, dx:dx + W - k + 1]
    return out


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Mean SSIM over channels (Wang et al. 2004 defaults)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    win = _gaussian_window()
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mx = _filter2(x, win)
        my = _filter2(y, win)
        mx2, my2, mxy = mx * mx, my * my, mx * my
        sx = _filter2(x * x, win) - mx2
        sy = _filter2(y * y, win) - my2
        sxy = _filter2(x * y, win) - mxy
        m = ((2 * mxy + C1) * (2 * sxy + C2)) \
            / ((mx2 + my2 + C1) * (sx + sy + C2))
        vals.append(float(m.mean()))
    return float(np.mean(vals))


# --- LPIPS (Zhang et al. 2018, AlexNet backbone) ---------------------------
# Weight file format (.npz): conv1..conv5 AlexNet feature convs as
# convN_w [Cout, Cin, kh, kw] / convN_b [Cout] (torchvision layout), plus
# linN_w [1, CN] non-negative per-channel weights of the LPIPS linear
# heads.  `port_lpips_weights` writes this npz from torch checkpoints.

_ALEX_SPEC = (  # (name, stride, padding, maxpool-after)
    ("conv1", 4, 2, True),
    ("conv2", 1, 2, True),
    ("conv3", 1, 1, False),
    ("conv4", 1, 1, False),
    ("conv5", 1, 1, True),
)
# LPIPS input scaling layer (net-lin model shift/scale, applied to [-1,1]).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _alex_taps(x, weights):
    """x: [1,3,H,W] scaled input; returns the 5 post-ReLU feature maps."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    taps = []
    for i, (name, stride, pad, pool) in enumerate(_ALEX_SPEC):
        w = jnp.asarray(weights[f"{name}_w"], jnp.float32)
        b = jnp.asarray(weights[f"{name}_b"], jnp.float32)
        x = lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + b[None, :, None, None])
        taps.append(x)
        if pool and i + 1 < len(_ALEX_SPEC):
            # the pool only feeds the NEXT conv; after the last tap it
            # would be dead work executed eagerly on every call
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                                  (1, 1, 2, 2), "VALID")
    return taps


def lpips(a: np.ndarray, b: np.ndarray, weights) -> float:
    """LPIPS distance between two [H,W,3] float images in [0,1].

    weights: path to the .npz described above, or an already-loaded
    mapping. Follows the reference formulation: unit-normalize each
    layer's channels, squared difference, 1x1 linear head, spatial mean,
    sum over layers.
    """
    import jax.numpy as jnp

    if isinstance(weights, str):
        weights = dict(np.load(weights))

    def prep(img):
        x = jnp.asarray(img, jnp.float32) * 2.0 - 1.0           # [-1, 1]
        x = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
        return jnp.transpose(x, (2, 0, 1))[None]                # [1,3,H,W]

    ta = _alex_taps(prep(a), weights)
    tb = _alex_taps(prep(b), weights)
    total = jnp.float32(0.0)
    for i, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa / jnp.sqrt(jnp.sum(fa * fa, axis=1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(jnp.sum(fb * fb, axis=1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2                                     # [1,C,H,W]
        lin = jnp.asarray(weights[f"lin{i + 1}_w"], jnp.float32)
        total = total + jnp.mean(
            jnp.sum(d2 * lin[None, 0, :, None, None], axis=1))
    return float(total)


def port_lpips_weights(alexnet_pth: str, lpips_lin_pth: str,
                       out_npz: str) -> str:
    """Write the LPIPS .npz from local torch checkpoints (no network):
    alexnet_pth = torchvision alexnet state_dict (features.0/3/6/8/10),
    lpips_lin_pth = LPIPS 'alex' linear heads (lin0..lin4.model.1.weight).
    """
    import torch

    alex = torch.load(alexnet_pth, map_location="cpu")
    lin = torch.load(lpips_lin_pth, map_location="cpu")
    feat_idx = {"conv1": 0, "conv2": 3, "conv3": 6, "conv4": 8,
                "conv5": 10}
    out = {}
    for name, idx in feat_idx.items():
        out[f"{name}_w"] = alex[f"features.{idx}.weight"].numpy()
        out[f"{name}_b"] = alex[f"features.{idx}.bias"].numpy()
    for i in range(5):
        w = lin[f"lin{i}.model.1.weight"].numpy()     # [1, C, 1, 1]
        out[f"lin{i + 1}_w"] = w.reshape(1, -1)
    np.savez(out_npz, **out)
    return out_npz


def load01(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float64) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="first image path")
    ap.add_argument("--b", required=True, help="second image path")
    ap.add_argument("--metric", default="all",
                    choices=["all", "psnr", "ssim", "lpips"])
    ap.add_argument("--weights", default=None,
                    help="LPIPS weights .npz (required for --metric lpips;"
                         " see port_lpips_weights)")
    args = ap.parse_args()
    x, y = load01(args.a), load01(args.b)
    if x.shape != y.shape:
        raise SystemExit(f"shape mismatch: {x.shape} vs {y.shape}")
    out = {}
    if args.metric in ("all", "psnr"):
        out["psnr"] = round(psnr(x, y), 3)
    if args.metric in ("all", "ssim"):
        out["ssim"] = round(ssim(x, y), 4)
    if args.metric == "lpips" or (args.metric == "all" and args.weights):
        if not args.weights:
            raise SystemExit("--metric lpips requires --weights <npz> "
                             "(produce it with evaluate.port_lpips_weights)")
        out["lpips"] = round(lpips(x, y, args.weights), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
