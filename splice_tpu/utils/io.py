"""Output/IO utilities (reference util/util.py:42-59)."""
from __future__ import annotations

import os
import pathlib
from typing import Optional

import numpy as np
from PIL import Image


def save_result(image_hwc01, dataroot: str,
                filename: str = "output.png") -> str:
    """float [H,W,3] in [0,1] -> <dataroot>/out/<filename> PNG
    (reference util.py:55-59)."""
    arr = np.asarray(image_hwc01)
    arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    out_dir = pathlib.Path(dataroot) / "out"
    out_dir.mkdir(parents=True, exist_ok=True)
    path = str(out_dir / filename)
    Image.fromarray(arr).save(path)
    return path


def save_image(image_hwc01, path: str) -> str:
    arr = np.asarray(image_hwc01)
    arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)
    return path
