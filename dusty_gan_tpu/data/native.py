"""ctypes bindings for the native data-plane library (native/rangeproj.cpp).

Loads ``librangeproj.so`` (building it with make on first use when a
toolchain is present) and exposes the two hot host-side kernels; callers
fall back to the NumPy implementations in data/preprocess.py and
data/datasets.py when the library is unavailable.  Equivalence is enforced
by tests (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(__file__), "..", "..", "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "librangeproj.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DUSTY_GAN_TPU_NO_NATIVE"):
        return None
    try:
        if not osp.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", osp.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(osp.abspath(_LIB_PATH))
    except Exception:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.rangeproj_project_scan.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.rangeproj_project_scan.restype = ctypes.c_int
    lib.rangeproj_preprocess_item.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
    ]
    lib.rangeproj_preprocess_item.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def project_scan(points: np.ndarray, h: int = 64, w: int = 2048) -> Optional[np.ndarray]:
    """Native scan projection; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    n, c = points.shape
    out = np.zeros((h, w, c), np.float32)
    lib.rangeproj_project_scan(points, n, c, h, w, out)
    return out


def preprocess_item(
    scan: np.ndarray, min_depth: float, max_depth: float, flip: bool,
    shape: Tuple[int, int],
) -> Optional[dict]:
    """Native per-item dataset pipeline; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    scan = np.ascontiguousarray(scan, np.float32)
    h0, w0, c = scan.shape
    h, w = shape
    depth = np.empty((h, w), np.float32)
    mask = np.empty((h, w), np.float32)
    xyz = np.empty((h, w, 3), np.float32)
    lib.rangeproj_preprocess_item(
        scan, h0, w0, c, min_depth, max_depth, int(flip), h, w, depth, mask, xyz
    )
    return {"depth": depth[..., None], "mask": mask[..., None], "xyz": xyz}
