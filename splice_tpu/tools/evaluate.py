"""Output-quality evaluation: PSNR / SSIM between two images.

The acceptance hook for transfer quality (SURVEY.md §4 item 4 calls for a
perceptual comparison of our outputs against reference outputs on the
bundled pairs; LPIPS needs network-downloaded weights, so the offline
metrics here are PSNR and SSIM — SSIM per Wang et al. 2004 with the
standard 11x11 Gaussian window, K1=0.01, K2=0.03).

CLI:
    python -m splice_tpu.tools.evaluate --a out/output.png --b ref.png
prints one JSON line {"psnr": ..., "ssim": ...}.
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


def load01(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float64) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="first image path")
    ap.add_argument("--b", required=True, help="second image path")
    args = ap.parse_args()
    x, y = load01(args.a), load01(args.b)
    if x.shape != y.shape:
        raise SystemExit(f"shape mismatch: {x.shape} vs {y.shape}")
    print(json.dumps({"psnr": round(psnr(x, y), 3),
                      "ssim": round(ssim(x, y), 4)}))


if __name__ == "__main__":
    main()
