"""ctypes bindings for the native IO runtime (io.cc).

Compiled on first use with the baked-in g++ (no pip installs). All
entry points degrade gracefully to NumPy/PIL fallbacks when the
toolchain or libjpeg is unavailable, so the framework never hard-fails
on a machine without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "io.cc")
_LIB_PATH = os.path.join(_HERE, "libfacegen_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH, "-ljpeg", "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        return r.returncode == 0
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.fg_gather_rows.argtypes = [u8p, ctypes.c_int64, i64p, ctypes.c_int64,
                                       u8p, ctypes.c_int]
        lib.fg_gather_rows.restype = None
        lib.fg_random_indices.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_uint64, i64p]
        lib.fg_random_indices.restype = None
        lib.fg_shuffle.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64]
        lib.fg_shuffle.restype = None
        lib.fg_decode_crop_resize_batch.argtypes = [
            u8p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int,
        ]
        lib.fg_decode_crop_resize_batch.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_rows(store: np.ndarray, indices: np.ndarray, n_threads: int = 8) -> np.ndarray:
    """out[i] = store[indices[i]] with a native threaded memcpy gather;
    NumPy fancy-indexing fallback."""
    lib = get_lib()
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None or not isinstance(store, np.ndarray):
        return np.ascontiguousarray(np.asarray(store)[indices])
    row_bytes = int(np.prod(store.shape[1:])) * store.dtype.itemsize
    out = np.empty((len(indices),) + store.shape[1:], store.dtype)
    lib.fg_gather_rows(
        _u8ptr(store.view(np.uint8).reshape(store.shape[0], -1)),
        ctypes.c_int64(row_bytes),
        _i64ptr(indices),
        ctypes.c_int64(len(indices)),
        _u8ptr(out.view(np.uint8).reshape(len(indices), -1)),
        ctypes.c_int(n_threads),
    )
    return out


def random_indices(lo: int, hi: int, n: int, seed: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        rng = np.random.default_rng(seed)
        return rng.integers(lo, hi, size=n, dtype=np.int64)
    out = np.empty(n, np.int64)
    lib.fg_random_indices(lo, hi, n, ctypes.c_uint64(seed & (2**64 - 1)), _i64ptr(out))
    return out


def decode_crop_resize_batch(
    paths,
    out_size: int = 64,
    crop=(92, 175, 83, 166),
    n_threads: int = 8,
) -> np.ndarray:
    """Decode JPEGs, apply the fixed lfwcrop box, resize to out_size.

    Native libjpeg path with a PIL fallback. crop = (y0, y1, x0, x1)
    inclusive (generate_dataset.py:20-23).
    """
    lib = get_lib()
    n = len(paths)
    out = np.zeros((n, out_size, out_size, 3), np.uint8)
    if lib is not None:
        blobs = [open(p, "rb").read() for p in paths]
        sizes = np.array([len(b) for b in blobs], np.int64)
        offsets = np.zeros(n, np.int64)
        np.cumsum(sizes[:-1], out=offsets[1:])
        blob = np.frombuffer(b"".join(blobs), np.uint8)
        failures = lib.fg_decode_crop_resize_batch(
            _u8ptr(blob), _i64ptr(offsets), _i64ptr(sizes), ctypes.c_int64(n),
            crop[0], crop[1], crop[2], crop[3], out_size,
            _u8ptr(out.reshape(n, -1)), ctypes.c_int(n_threads),
        )
        if failures == 0:
            return out
        # fall through to PIL for robustness if anything failed
    # PIL fallback must honor the SAME crop box and out_size the native
    # path was asked for (a --no-crop build passes a full-frame box, and
    # out_size is a public parameter) — and redo every row: the native
    # path does not report WHICH rows failed.
    import numpy as _np
    from PIL import Image

    y0, y1, x0, x1 = crop
    for i, p in enumerate(paths):
        im = Image.open(p).convert("RGB")
        arr = _np.asarray(im)
        h, w = arr.shape[:2]
        # crop only when the image contains the full box — the same
        # skip-small-images rule as data/lfw.py:load_and_crop (the
        # --no-crop sentinel box (0, 1<<30, ...) never fits, so it
        # naturally degrades to full-frame)
        if h >= y1 + 1 and w >= x1 + 1:
            arr = arr[y0 : y1 + 1, x0 : x1 + 1]
        if arr.shape[:2] != (out_size, out_size):
            arr = _np.asarray(
                Image.fromarray(arr).resize((out_size, out_size),
                                            Image.BILINEAR)
            )
        out[i] = arr
    return out
