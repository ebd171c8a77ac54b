"""ctypes binding for the native C++ decode/pack stage (native/decoder.cpp).

Auto-builds the shared library on first use when a toolchain is present;
falls back cleanly to the PIL path otherwise (HostLoader decides). Decoded
grayscale matches PIL convert('L') (ITU-R 601-2 luma).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_NAME = "libstfdecoder.so"
_LIB_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(_LIB_DIR)), "native")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> Optional[str]:
    target = os.path.join(_LIB_DIR, _LIB_NAME)
    src = os.path.join(_SRC_DIR, "decoder.cpp")
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
             "-o", target, "-ljpeg", "-lpng", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return target
    except Exception as e:
        print(f"native decoder build failed ({e}); using PIL fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native decoder; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    target = os.path.join(_LIB_DIR, _LIB_NAME)
    if not os.path.exists(target):
        target = _build()
        if target is None:
            return None
    try:
        lib = ctypes.CDLL(target)
        if not hasattr(lib, "stf_banded_resize"):
            # Stale build from before the resize kernel; rebuild once.
            del lib
            target = _build()
            if target is None:
                return None
            lib = ctypes.CDLL(target)
    except OSError as e:
        print(f"native decoder load failed ({e}); using PIL fallback")
        return None
    lib.stf_decode_batch.restype = ctypes.c_int
    lib.stf_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_uint8, ctypes.c_int]
    lib.stf_image_size.restype = ctypes.c_int
    lib.stf_image_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.stf_banded_resize.restype = ctypes.c_int
    lib.stf_banded_resize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def image_size(path: str) -> Optional[Tuple[int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    if lib.stf_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_batch(paths: List[str], canvas_h: int, canvas_w: int,
                 fill: int = 0, n_threads: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode `paths` into a packed uint8 canvas [N, canvas_h, canvas_w]
    (top-left anchored, `fill` padding). Returns (canvas, sizes [N, 2]).
    Failed decodes leave a zero-size entry (caller applies warn-and-skip)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    canvas = np.empty((n, canvas_h, canvas_w), dtype=np.uint8)
    sizes = np.zeros((n, 2), dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib.stf_decode_batch(
        arr, n, canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas_h, canvas_w, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        fill, n_threads)
    return canvas, sizes


def banded_resize(src: np.ndarray, out_h: int, out_w: int,
                  idx_h: np.ndarray, wgt_h: np.ndarray,
                  idx_w: np.ndarray, wgt_w: np.ndarray,
                  n_threads: Optional[int] = None) -> np.ndarray:
    """Banded separable PIL-parity resize of uint8 planes [N, H, W] ->
    [N, out_h, out_w] via the native kernel. Bit-identical to the numpy
    fallback in data/transforms (ascending-k f64 accumulation,
    round-half-even)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    src = np.ascontiguousarray(src, dtype=np.uint8)
    n, in_h, in_w = src.shape
    dst = np.empty((n, out_h, out_w), dtype=np.uint8)
    idx_h = np.ascontiguousarray(idx_h, dtype=np.int64)
    wgt_h = np.ascontiguousarray(wgt_h, dtype=np.float64)
    idx_w = np.ascontiguousarray(idx_w, dtype=np.int64)
    wgt_w = np.ascontiguousarray(wgt_w, dtype=np.float64)
    assert idx_h.shape[0] == out_h and idx_w.shape[0] == out_w
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.stf_banded_resize(
        src.ctypes.data_as(u8p), n, in_h, in_w,
        dst.ctypes.data_as(u8p), out_h, out_w,
        idx_h.ctypes.data_as(i64p), wgt_h.ctypes.data_as(f64p),
        idx_h.shape[1],
        idx_w.ctypes.data_as(i64p), wgt_w.ctypes.data_as(f64p),
        idx_w.shape[1], n_threads)
    return dst
