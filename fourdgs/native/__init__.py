"""Native (C++) host-runtime ops with ctypes bindings.

Builds fourdgs/native/csrc/host_ops.cc with g++ on first use (cached in
_build/); every entry point has a numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "host_ops.cc")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD_DIR, "host_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.knn_mean_sq_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.knn_mean_sq_dist.restype = None
            lib.voxel_downsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.voxel_downsample.restype = ctypes.c_int64
            lib.region_filter.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.region_filter.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def has_native() -> bool:
    return _load() is not None


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Host 3-NN mean squared distance (simple-knn semantics)."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty(n, np.float32)
        lib.knn_mean_sq_dist(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    # numpy fallback (exact, O(N^2) in chunks)
    out = np.empty(n, np.float32)
    chunk = 2048
    for s in range(0, n, chunk):
        d2 = ((pts[s:s + chunk, None, :] - pts[None, :, :]) ** 2).sum(-1)
        for i in range(d2.shape[0]):
            d2[i, s + i] = np.inf
        part = np.partition(d2, k, axis=1)[:, :k]
        out[s:s + chunk] = part.mean(1)
    return out


def voxel_downsample_mask(points: np.ndarray, voxel: float) -> np.ndarray:
    """Boolean keep-mask: first point per voxel."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _load()
    if lib is not None:
        keep = np.empty(n, np.uint8)
        lib.voxel_downsample(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(voxel),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.astype(bool)
    key = np.floor(pts / voxel).astype(np.int64)
    _, first = np.unique(key, axis=0, return_index=True)
    keep = np.zeros(n, bool)
    keep[first] = True
    return keep


_warned_crude = False


def region_filter(mask: np.ndarray, min_region: int) -> np.ndarray:
    """Keep only 4-connected True regions with >= min_region pixels
    (native union-find; numpy BFS fallback). Used by the motion
    segmenter's per-frame region filtering."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    lib = _load()
    if lib is not None:
        out = np.empty(h * w, np.uint8)
        lib.region_filter(
            m.reshape(-1).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, min_region,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.reshape(h, w).astype(bool)
    # vectorized fallback (this runs on the per-frame prefetch hot path:
    # a per-pixel Python BFS costs seconds at 640x480)
    mb = mask.astype(bool)
    try:
        from scipy.ndimage import label

        lbl, n_lab = label(mb)
        if n_lab == 0:
            return np.zeros((h, w), bool)
        sizes = np.bincount(lbl.reshape(-1), minlength=n_lab + 1)
        keep_lab = sizes >= min_region
        keep_lab[0] = False
        return keep_lab[lbl]
    except Exception:
        # crude global-count fallback (no native lib AND no scipy —
        # neither happens in a standard install): all-or-nothing, which
        # KEEPS sub-threshold specks whenever the total count passes.
        # Warn once rather than silently change motion-mask semantics.
        global _warned_crude
        if not _warned_crude:
            _warned_crude = True
            import warnings

            warnings.warn(
                "region_filter: no native lib and no scipy — falling "
                "back to all-or-nothing region filtering (small noise "
                "regions are NOT removed individually)"
            )
        return mb if mb.sum() >= min_region else np.zeros((h, w), bool)
