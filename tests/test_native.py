"""Native C++ worldgen core: builds via g++, produces IDENTICAL paths to
the pure-Python planner, and is substantially faster on large grids."""

import time

import numpy as np
import pytest

from rvo3d_tpu.worlds.gen.lineofsight import line_of_sight_3d
from rvo3d_tpu.worlds.gen.native import (los3d_native, native_available,
                                         theta_star_native)
from rvo3d_tpu.worlds.gen.planner import theta_star_3d

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="g++ toolchain unavailable")


def _random_grid(rng, shape, p=0.12):
    g = (rng.random(shape) < p).astype(float)
    g[0, :, :] = 1
    g[-1, :, :] = 1
    g[:, 0, :] = 1
    g[:, -1, :] = 1
    return g


@needs_native
def test_los_native_matches_python():
    rng = np.random.default_rng(0)
    g = _random_grid(rng, (20, 20, 8))
    for _ in range(50):
        p0 = rng.uniform(1, 18, 3)
        p1 = rng.uniform(1, 18, 3)
        p0[2] = min(p0[2], 7)
        p1[2] = min(p1[2], 7)
        assert los3d_native(g, p0, p1) == line_of_sight_3d(g, p0, p1)


@needs_native
def test_theta_star_native_identical_paths():
    rng = np.random.default_rng(1)
    for trial in range(10):
        g = _random_grid(rng, (18, 18, 6), p=0.10)
        start = (2, 2, 2)
        goal = (15, 15, 3)
        g[start] = 0
        g[goal] = 0
        py = theta_star_3d(g, start, goal, use_native=False)
        nat = theta_star_native(g, start, goal)
        if py is None:
            assert nat is None, f"trial {trial}: python None, native found"
        else:
            assert nat is not None, f"trial {trial}: native None, python found"
            np.testing.assert_array_equal(
                py[0], nat[0], err_msg=f"trial {trial} paths differ")


@needs_native
def test_native_speedup_on_big_grid():
    rng = np.random.default_rng(2)
    g = _random_grid(rng, (60, 60, 10), p=0.08)
    start, goal = (2, 2, 2), (57, 57, 7)
    g[start] = 0
    g[goal] = 0

    t0 = time.perf_counter()
    nat = theta_star_native(g, start, goal)
    t_nat = time.perf_counter() - t0

    t0 = time.perf_counter()
    py = theta_star_3d(g, start, goal, use_native=False)
    t_py = time.perf_counter() - t0

    assert (py is None) == (nat is None)
    if py is not None:
        np.testing.assert_array_equal(py[0], nat[0])
    assert t_nat < t_py, f"native {t_nat:.3f}s not faster than python {t_py:.3f}s"
