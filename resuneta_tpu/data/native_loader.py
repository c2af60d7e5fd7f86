"""ctypes bindings for the native C++ batch loader (native/loader.cpp).

Auto-builds libresuneta_loader.so with g++ on first use (cached next to the
source); every consumer falls back to the pure-Python thread pool when the
toolchain or the .so is unavailable, so the native path is a transparent
accelerator, never a hard dependency.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_NAME = "libresuneta_loader.so"

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build_so(native_dir):
    src = os.path.join(native_dir, "loader.cpp")
    out = os.path.join(native_dir, _SO_NAME)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
           "-shared", "-o", out, src, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        native_dir = os.path.abspath(_NATIVE_DIR)
        so_path = os.path.join(native_dir, _SO_NAME)
        try:
            if not os.path.exists(so_path):
                if not os.path.exists(os.path.join(native_dir, "loader.cpp")):
                    _build_failed = True
                    return None
                _build_so(native_dir)
            lib = ctypes.CDLL(so_path)
            lib.rl_load_batch.restype = ctypes.c_int
            lib.rl_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_char_p,
                ctypes.c_long, ctypes.c_int,
            ]
            lib.rl_gather_rows.restype = ctypes.c_int
            lib.rl_gather_rows.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def load_npy_batch(paths, item_shape, dtype, n_threads=8):
    """Parallel-load a list of same-shape .npy files into one stacked array.
    Returns None if the native library is unavailable or any file mismatches
    (callers fall back to np.load)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    item = np.empty(item_shape, dtype)
    bytes_per_item = item.nbytes
    out = np.empty((n,) + tuple(item_shape), dtype)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.rl_load_batch(arr, n, out.ctypes.data_as(ctypes.c_char_p),
                           bytes_per_item, n_threads)
    if rc != 0:
        return None
    return out


def gather_rows(src, indices, n_threads=8):
    """dest[i] = src[indices[i]] with parallel memcpy; src must be C-contiguous
    along trailing dims (memmap ok). Falls back to fancy indexing when the
    native library is unavailable."""
    lib = get_lib()
    indices = np.asarray(indices, np.int64)
    if lib is None:
        return np.ascontiguousarray(src[indices])
    n = len(indices)
    item_bytes = int(np.prod(src.shape[1:])) * src.dtype.itemsize
    out = np.empty((n,) + src.shape[1:], src.dtype)
    src_arr = np.ascontiguousarray(src) if not isinstance(src, np.memmap) else src
    idx_arr = indices.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    rc = lib.rl_gather_rows(
        src_arr.ctypes.data_as(ctypes.c_char_p) if not isinstance(src, np.memmap)
        else ctypes.c_char_p(src.ctypes.data),
        idx_arr, n, out.ctypes.data_as(ctypes.c_char_p), item_bytes, n_threads)
    if rc != 0:
        return np.ascontiguousarray(src[indices])
    return out
