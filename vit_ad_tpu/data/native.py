"""ctypes binding for the native C++ data loader (native/dataio.cpp).

Builds the shared library on first use (g++ against the system libpng /
libjpeg / zlib) and caches it next to the source; every entry point has a
PIL fallback so the framework works without a toolchain. The reference has
no native components at all (SURVEY.md §2.7) — its decode path is PIL inside
torch DataLoader workers (reference src/data_loader/GeneralDataset.py:81-83).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "dataio.cpp")
_SO = os.path.join(_NATIVE_DIR, "libvitad_dataio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO, _SRC, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if necessary; None when
    unavailable (PIL fallback paths engage)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("VITAD_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.vitad_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vitad_load_image.restype = ctypes.c_int
    lib.vitad_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.vitad_load_batch.restype = ctypes.c_int
    lib.vitad_load_mask.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vitad_load_mask.restype = ctypes.c_int
    _lib = lib
    return _lib


def load_image(path: str, img_size: int) -> Optional[np.ndarray]:
    """[H, W, 3] uint8, or None if native decode unavailable/failed."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((img_size, img_size, 3), dtype=np.uint8)
    rc = lib.vitad_load_image(
        path.encode(), img_size, img_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def load_batch(
    paths: List[str], img_size: int, n_threads: int = 0
) -> Optional[np.ndarray]:
    """[N, H, W, 3] uint8 batch decoded with a native thread pool."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, img_size, img_size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    failures = lib.vitad_load_batch(
        arr, n, img_size, img_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    return out if failures == 0 else None


def load_mask(path: str, img_size: int) -> Optional[np.ndarray]:
    """[H, W] uint8 binary mask, or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((img_size, img_size), dtype=np.uint8)
    rc = lib.vitad_load_mask(
        path.encode(), img_size, img_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None
