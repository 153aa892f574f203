"""ctypes bindings for the native host-preprocessing library.

Builds ``geopurify_native.cpp`` with g++ on first use (cached .so next to the
source), exposes typed wrappers, and degrades gracefully: ``available()``
returns False when no toolchain exists and callers fall back to the numpy
implementations with identical semantics (pinned by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "geopurify_native.cpp")
_SO = os.path.join(_HERE, "_geopurify_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_lock = threading.Lock()


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            # a stale/foreign-ABI cached .so must degrade to numpy, not raise
            return ctypes.CDLL(_SO)
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, "-o", _SO,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(_SO)
    except (OSError, subprocess.SubprocessError):
        _build_failed = True
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                _declare(lib)
            _lib = lib
    return _lib


def _declare(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.fnv_hash_rows.argtypes = [i64p, ctypes.c_int64, ctypes.c_int32, u64p]
    lib.fnv_hash_rows.restype = None
    lib.fnv_voxelize.argtypes = [i64p, ctypes.c_int64, ctypes.c_int32, i64p, i64p]
    lib.fnv_voxelize.restype = ctypes.c_int64
    lib.compute_mapping.argtypes = [
        f32p, ctypes.c_int64, f64p, f64p, f32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        i32p, i32p, u8p,
    ]
    lib.compute_mapping.restype = None
    lib.accumulate_face_normals.argtypes = [
        f32p, ctypes.c_int64, i64p, ctypes.c_int64, f64p
    ]
    lib.accumulate_face_normals.restype = None
    lib.nearest_donor.argtypes = [f32p, ctypes.c_int64, u8p, i64p]
    lib.nearest_donor.restype = None
    lib.grid_knn.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i64p, f32p]
    lib.grid_knn.restype = None


def available() -> bool:
    return _get() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def fnv_voxelize(discrete: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Native np.unique-by-FNV-hash dedup; returns (inds, inds_reverse)."""
    lib = _get()
    assert lib is not None
    coords = np.ascontiguousarray(discrete, np.int64)
    n, d = coords.shape
    inds = np.empty(n, np.int64)
    inds_reverse = np.empty(n, np.int64)
    m = lib.fnv_voxelize(
        _ptr(coords, ctypes.c_int64), n, d,
        _ptr(inds, ctypes.c_int64), _ptr(inds_reverse, ctypes.c_int64),
    )
    return inds[:m].copy(), inds_reverse


def compute_mapping(
    points: np.ndarray, w2c: np.ndarray, K: np.ndarray,
    depth: Optional[np.ndarray], image_dim: Tuple[int, int],
    cut_bound: int = 10, vis_thres: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _get()
    assert lib is not None
    W, H = image_dim
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    w2c_ = np.ascontiguousarray(w2c, np.float64)
    K_ = np.ascontiguousarray(K[:3, :3], np.float64)
    rows = np.empty(n, np.int32)
    cols = np.empty(n, np.int32)
    vis = np.empty(n, np.uint8)
    if depth is not None:
        depth_ = np.ascontiguousarray(depth, np.float32)
        dptr = _ptr(depth_, ctypes.c_float)
    else:
        dptr = ctypes.POINTER(ctypes.c_float)()
    lib.compute_mapping(
        _ptr(pts, ctypes.c_float), n, _ptr(w2c_, ctypes.c_double),
        _ptr(K_, ctypes.c_double), dptr, W, H, cut_bound, vis_thres,
        _ptr(rows, ctypes.c_int32), _ptr(cols, ctypes.c_int32),
        _ptr(vis, ctypes.c_uint8),
    )
    return rows, cols, vis.astype(bool)


def vertex_normals(xyz: np.ndarray, faces: np.ndarray) -> np.ndarray:
    lib = _get()
    assert lib is not None
    x = np.ascontiguousarray(xyz, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.zeros((len(x), 3), np.float64)
    lib.accumulate_face_normals(
        _ptr(x, ctypes.c_float), len(x), _ptr(f, ctypes.c_int64), len(f),
        _ptr(out, ctypes.c_double),
    )
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(norm, 1e-12)).astype(np.float32)


def grid_knn(coords: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact kNN over unique integer grid cells (Chebyshev-shell expansion).

    Returns (idx [m, k] int64 with -1 padding, d2 [m, k] f32 ascending).
    """
    lib = _get()
    assert lib is not None
    c = np.ascontiguousarray(coords, np.int32)
    # the packed 21-bit/field hash key is collision-free only in this range
    if len(c) and (c.min() < -16384 or c.max() >= 2080768):
        raise ValueError(
            f"grid_knn coords out of packed-key range [-16384, 2080768): "
            f"[{c.min()}, {c.max()}]"
        )
    m = len(c)
    idx = np.empty((m, k), np.int64)
    d2 = np.empty((m, k), np.float32)
    lib.grid_knn(
        _ptr(c, ctypes.c_int32), m, k,
        _ptr(idx, ctypes.c_int64), _ptr(d2, ctypes.c_float),
    )
    return idx, d2


def nearest_donor(coords: np.ndarray, has_value: np.ndarray) -> np.ndarray:
    """Host-side (C++) nearest-donor index per row: for each row of
    ``coords``, the index of the nearest row with ``has_value`` set (rows
    that already have a value return themselves). NOT the device-side
    ``geopurify_tpu.ops.knn.nearest_donor`` — that one takes a ``valid``
    padding mask and returns an (donor, filled) pair."""
    lib = _get()
    assert lib is not None
    c = np.ascontiguousarray(coords, np.float32)
    hv = np.ascontiguousarray(has_value, np.uint8)
    out = np.empty(len(c), np.int64)
    lib.nearest_donor(
        _ptr(c, ctypes.c_float), len(c), _ptr(hv, ctypes.c_uint8),
        _ptr(out, ctypes.c_int64),
    )
    return out
