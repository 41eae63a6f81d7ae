"""ctypes bindings + on-demand build for the native data-path library.

native/blobops.cpp holds the host-side hot loops (z-buffered point
splatting, vertex-target writing) — the role the reference fills with
its C++ synthesizer/data-layer code. Falls back cleanly to the NumPy
implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "blobops.cpp")
_OUT = os.path.join(os.path.dirname(_SRC), "libblobops.so")


def _build() -> Optional[str]:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _OUT],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _OUT
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.splat_points.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, f32p, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32,
            f32p, i32p, f32p,
        ]
        lib.splat_points.restype = None
        lib.splat_points_rgb.argtypes = [
            i32p, i32p, f32p, f32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32,
            f32p, i32p, f32p,
        ]
        lib.splat_points_rgb.restype = None
        lib.vertex_targets.argtypes = [
            i32p, f32p, f32p, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p,
        ]
        lib.vertex_targets.restype = None
        _LIB = lib
        return _LIB


def splat_points_native(
    u: np.ndarray, v: np.ndarray, z: np.ndarray, cls: int, radius: int,
    color: np.ndarray, t_far: float,
    depth_buf: np.ndarray, label_buf: np.ndarray, image_buf: np.ndarray,
) -> bool:
    """In-place native splat; returns False if the library is absent."""
    lib = get_lib()
    if lib is None:
        return False
    lib.splat_points(
        np.ascontiguousarray(u, np.int32),
        np.ascontiguousarray(v, np.int32),
        np.ascontiguousarray(z, np.float32),
        len(u), cls, radius,
        np.ascontiguousarray(color, np.float32), t_far,
        depth_buf.shape[0], depth_buf.shape[1],
        depth_buf, label_buf, image_buf,
    )
    return True


def splat_points_rgb_native(
    u: np.ndarray, v: np.ndarray, z: np.ndarray, rgb: np.ndarray,
    cls: int, radius: int,
    depth_buf: np.ndarray, label_buf: np.ndarray, image_buf: np.ndarray,
    eps: float = 0.01,
) -> bool:
    """In-place native two-pass visibility splat (per-point colors);
    False if the library is absent."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "splat_points_rgb"):
        return False
    lib.splat_points_rgb(
        np.ascontiguousarray(u, np.int32),
        np.ascontiguousarray(v, np.int32),
        np.ascontiguousarray(z, np.float32),
        np.ascontiguousarray(rgb, np.float32),
        len(u), cls, radius, eps,
        depth_buf.shape[0], depth_buf.shape[1],
        depth_buf, label_buf, image_buf,
    )
    return True


def vertex_targets_native(
    label: np.ndarray, centers: np.ndarray, log_z: np.ndarray,
    weight_inside: float, num_classes: int,
    targets: np.ndarray, weights: np.ndarray,
) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    lib.vertex_targets(
        np.ascontiguousarray(label, np.int32),
        np.ascontiguousarray(centers, np.float32),
        np.ascontiguousarray(log_z, np.float32),
        weight_inside, label.shape[0], label.shape[1], num_classes,
        targets, weights,
    )
    return True
