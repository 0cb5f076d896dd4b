"""Native (C++) runtime components, bound via ctypes.

Currently: a zlib-backed PNG encoder for the output/logging path (the one
host-side cost left in the hot loop — everything else runs on device). The
shared library is built on first use with g++ and cached next to the
source; every consumer falls back to PIL when the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "pngio.cpp"
_LIB = _DIR / "libpngio.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # Compile to a per-pid temp name and os.replace into place: the
    # module _lock only serializes threads within ONE process, and two
    # processes (elastic-recovery relaunch, concurrent benches) must not
    # dlopen a half-written .so or clobber each other's output.
    tmp = _LIB.with_suffix(f".so.tmp{os.getpid()}")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-lz",
             "-o", str(tmp)],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.png_encode_rgb8.restype = ctypes.c_int
            lib.png_encode_rgb8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t]
            lib.png_max_size.restype = ctypes.c_size_t
            lib.png_max_size.argtypes = [ctypes.c_int, ctypes.c_int]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def encode_png_rgb8(arr, compress_level: int = 6) -> bytes | None:
    """uint8 [H, W, 3] -> PNG bytes via the native encoder; None if the
    native path is unavailable (caller falls back to PIL)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        return None    # not RGB8 (grayscale/RGBA): caller falls back to PIL
    h, w = a.shape[:2]
    cap = lib.png_max_size(h, w)
    out = ctypes.create_string_buffer(cap)
    n = lib.png_encode_rgb8(a.ctypes.data, h, w, a.strides[0],
                            compress_level, out, cap)
    if n <= 0:
        return None
    return out.raw[:n]
