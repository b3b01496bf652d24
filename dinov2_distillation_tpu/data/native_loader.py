"""ctypes bridge to the native staging loader (native/staging_loader.cpp).

JPEG decode + antialiased resize in C++ (libjpeg with DCT-domain scaling);
called through ctypes so worker *threads* decode in parallel without the
GIL. Auto-builds the shared library with g++ on first use; anything that
fails (non-JPEG file, exotic colorspace, missing toolchain) falls back to
the PIL path transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..utils.logger import get_logger

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstaging.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libstaging.so"],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.stage_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.stage_jpeg.restype = ctypes.c_int
            _lib = lib
            get_logger().info(f"native staging loader loaded from {_LIB_PATH}")
        except Exception as e:
            get_logger().warning(f"native staging loader unavailable ({e}); "
                                 "falling back to PIL decode")
            _lib_failed = True
    return _lib


def stage_jpeg_file(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Decode+resize a JPEG file to (out_h, out_w, 3) uint8, or None to
    signal PIL fallback."""
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.stage_jpeg(
        data, len(data), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def native_available() -> bool:
    return _load() is not None
