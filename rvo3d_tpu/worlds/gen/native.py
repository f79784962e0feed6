"""ctypes loader for the native world-generation core (native/theta_star.cpp).

Builds libworldgen.so with g++ on first use (cached next to the source) and
exposes theta_star / line-of-sight with the exact same results as the
Python implementations — the planner picks native automatically when the
toolchain is present and falls back silently otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))),
    "native", "theta_star.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libworldgen.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RVO3D_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO)
        lib.theta_star.restype = ctypes.c_int
        lib.theta_star.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.los3d.restype = ctypes.c_int
        lib.los3d.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def theta_star_native(grid_safe: np.ndarray, start, goal, *, kg=1.0,
                      kh=1.25, ke=1.0, blocked_threshold=1.0,
                      samples_per_cell=3.0
                      ) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    assert lib is not None
    g = np.ascontiguousarray(grid_safe, np.float64)
    ys, xs, zs = g.shape
    max_len = int(ys * xs * zs) + 1
    out = np.zeros((max_len, 3), np.int32)
    n = lib.theta_star(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ys, xs, zs,
        float(start[0]), float(start[1]), float(start[2]),
        float(goal[0]), float(goal[1]), float(goal[2]),
        float(kg), float(kh), float(ke), float(blocked_threshold),
        float(samples_per_cell),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len,
    )
    if n <= 0:
        return None
    return out[:n].astype(float), n


def los3d_native(grid: np.ndarray, p0, p1, samples_per_cell=3.0) -> int:
    lib = _load()
    assert lib is not None
    g = np.ascontiguousarray(grid, np.float64)
    ys, xs, zs = g.shape
    return lib.los3d(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ys, xs, zs,
        float(p0[0]), float(p0[1]), float(p0[2]),
        float(p1[0]), float(p1[1]), float(p1[2]), float(samples_per_cell),
    )
