"""ctypes bridge to the native (C++) host-side kernels.

Builds native/heatmap_renderer.cc on first use (g++ -O3 -shared) into a
cached .so and exposes `render_heatmaps`. Falls back transparently to the
numpy implementation when the toolchain or binary is unavailable — callers
use `generate_input_heatmap_native` unconditionally.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from fvp_tpu.config import FVPConfig

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "heatmap_renderer.cc")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libfvp_native.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        stale = (not os.path.exists(_LIB_PATH)
                 or (os.path.exists(_SRC)
                     and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)))
        if stale and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.render_heatmaps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_uint64,
        ]
        lib.render_heatmaps.restype = None
        _lib = lib
        return _lib


def generate_input_heatmap_native(cfg: FVPConfig, joints, joints_vis=None,
                                  augment: bool = False, seed: int = 0
                                  ) -> np.ndarray | None:
    """Native fast path for the heatmap renderer (augmentation draws from a
    seeded native RNG — same distribution as the numpy path, different
    stream). joints: list of (J, >=2) arrays in working-image coords.
    Returns (J, hm_h, hm_w) or None if the native library is
    unavailable."""
    lib = get_lib()
    if lib is None or len(joints) == 0:
        return None
    n_people = len(joints)
    n_joints = joints[0].shape[0]
    hm_w, hm_h = cfg.heatmap_size
    jarr = np.ascontiguousarray(
        np.stack([np.asarray(j)[:, :2] for j in joints]), np.float32)
    if joints_vis is not None:
        varr = np.ascontiguousarray(
            np.stack([np.asarray(v) for v in joints_vis]) > 0
        ).astype(np.uint8)
        vptr = varr.ctypes.data_as(ctypes.c_void_p)
    else:
        varr = None
        vptr = None
    out = np.zeros((n_joints, hm_h, hm_w), np.float32)
    sx = cfg.image_size[0] / cfg.heatmap_size[0]
    sy = cfg.image_size[1] / cfg.heatmap_size[1]
    lib.render_heatmaps(
        jarr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), vptr,
        n_people, n_joints,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hm_w, hm_h, ctypes.c_float(sx), ctypes.c_float(sy),
        ctypes.c_float(cfg.sigma), int(bool(augment)),
        ctypes.c_uint64(seed & (2 ** 64 - 1)))
    return out
