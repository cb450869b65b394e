"""ctypes binding + on-demand build of the native C++ components.

The reference binds its C++ HEM through pybind11 with Python-list marshaling
(`/root/reference/src/cpp_ext/mixturelevel.cpp:14-70` — an O(N) copy through
PyObjects each way). Here the native library exposes a flat-array C ABI and
numpy buffers pass zero-copy through ctypes. The library is compiled on first
use with g++ (-O3 -fopenmp) and cached next to the sources; if no compiler is
available the callers fall back to the pure-JAX path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsrhem.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "hem.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-std=c++17", "-fopenmp", "-shared", "-fPIC",
        _SRC_PATH, "-o", _LIB_PATH,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed:\n{proc.stderr[-2000:]}"
    return None


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
        ):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.gsr_hem_cluster_level.restype = ctypes.c_int
        lib.gsr_hem_cluster_level.argtypes = [
            ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, f32p, f32p, f32p, f32p, u8p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p, f32p, f32p, f32p, f32p, f32p, f32p,
        ]
        lib.gsr_hem_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def build_error() -> Optional[str]:
    return _build_error


def hem_cluster_level_native(
    mean: np.ndarray, color: np.ndarray, cov6: np.ndarray,
    opacity: np.ndarray, weight: np.ndarray, features: np.ndarray,
    nvar: np.ndarray, is_parent: np.ndarray,
    distance_delta: float, color_delta: float, decay_rate: float,
):
    """One HEM round on the host. Returns compacted output arrays
    (mean, color, cov6, opacity, weight, features, nvar), or None if the
    native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = int(mean.shape[0])
    fdim = int(features.shape[1]) if features.ndim == 2 else 0
    c = lambda a, t=np.float32: np.ascontiguousarray(a, dtype=t)
    mean, color, cov6 = c(mean), c(color), c(cov6)
    opacity, weight = c(opacity).reshape(n), c(weight).reshape(n)
    features = c(features).reshape(n, max(fdim, 1)) if fdim else np.zeros((n, 1), np.float32)
    nvar = c(nvar)
    is_parent = np.ascontiguousarray(is_parent, dtype=np.uint8)

    out_mean = np.empty((n, 3), np.float32)
    out_color = np.empty((n, 3), np.float32)
    out_cov6 = np.empty((n, 6), np.float32)
    out_opacity = np.empty(n, np.float32)
    out_weight = np.empty(n, np.float32)
    out_features = np.empty((n, max(fdim, 1)), np.float32)
    out_nvar = np.empty((n, 3), np.float32)

    count = lib.gsr_hem_cluster_level(
        n, max(fdim, 1), mean, color, cov6, opacity, weight, features, nvar,
        is_parent, float(distance_delta), float(color_delta), float(decay_rate),
        out_mean, out_color, out_cov6, out_opacity, out_weight, out_features,
        out_nvar,
    )
    if count < 0:
        return None
    k = count
    return (
        out_mean[:k], out_color[:k], out_cov6[:k], out_opacity[:k],
        out_weight[:k], out_features[:k, :fdim] if fdim else out_features[:k, :0],
        out_nvar[:k],
    )
