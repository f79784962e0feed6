"""World generation pipeline tests: endpoints, city occupancy invariants,
Theta* planning, and the full generate -> save -> load -> step roundtrip."""

import os

import numpy as np
import pytest

from rvo3d_tpu.worlds.gen import (cylinder_city, generate_world,
                                  line_of_sight_3d, random_endpoints,
                                  theta_star_3d)


def test_random_endpoints_spacing():
    eps = random_endpoints(4, (20, 20, 5), min_distance=6.0, seed=1)
    pts = eps["start_points"] + eps["end_points"]
    assert len(pts) == 8
    for s, e in zip(eps["start_points"], eps["end_points"]):
        d = np.linalg.norm(np.array(s) - np.array(e))
        assert d >= 6.0


def test_random_endpoints_unsatisfiable_raises():
    with pytest.raises(RuntimeError):
        random_endpoints(50, (5, 5, 3), min_distance=100.0, seed=0,
                         max_tries=200)


def test_cylinder_city_invariants():
    starts = [(2, 2, 1)]
    ends = [(17, 17, 3)]
    E, E_safe, e3d, e3d_safe, buildings = cylinder_city(
        (20, 20, 6), starts, ends, seed=3)
    assert e3d.shape == (20, 20, 6)
    # fence walls occupied
    assert e3d[0].all() and e3d[-1].all()
    assert e3d[:, 0].all() and e3d[:, -1].all()
    # safety margins are 0.5 and only adjacent to occupancy
    margin = e3d_safe == 0.5
    assert (e3d[margin] == 0).all()
    # occupied implies safe-grid occupied
    assert (e3d_safe[e3d == 1] == 1).all()
    # start surroundings cleared (start at y=2,x=2 with n_low=1)
    assert E[2, 2] == 0
    for b in buildings:
        y, x, h, r = b
        assert 3 <= h <= 6 and r in (0.0, 1.0)


def test_line_of_sight():
    g = np.zeros((10, 10, 5))
    assert line_of_sight_3d(g, (1, 1, 1), (8, 8, 3)) == 1
    g[5, 5, :] = 1.0
    assert line_of_sight_3d(g, (1, 1, 1), (8, 8, 3)) == 0
    # 0.5 margin does not block sight
    g[5, 5, :] = 0.5
    assert line_of_sight_3d(g, (1, 1, 1), (8, 8, 3)) == 1


def test_theta_star_straight_when_free():
    g = np.zeros((10, 10, 5))
    path, n = theta_star_3d(g, (1, 1, 1), (8, 8, 3))
    assert n == 2  # free grid -> single shortcut segment
    np.testing.assert_array_equal(path[0], [1, 1, 1])
    np.testing.assert_array_equal(path[-1], [8, 8, 3])


def test_theta_star_routes_around_wall():
    g = np.zeros((11, 11, 5))
    g[:, 5, :] = 1.0
    g[1, 5, :] = 0.0  # gap at y=1
    path, n = theta_star_3d(g, (9, 1, 2), (9, 9, 2))
    assert n >= 3
    # path passes through the gap column
    cols = path[:, 1]
    assert (cols == 5).sum() <= 1  # crosses the wall column at most once


def test_theta_star_unreachable():
    g = np.zeros((8, 8, 4))
    g[:, 4, :] = 1.0  # solid wall
    assert theta_star_3d(g, (2, 1, 1), (2, 6, 1)) is None


def test_generate_world_roundtrip(tmp_path):
    wd = generate_world("gen_test", num_drones=3, map_size=(14, 14, 6), seed=5)
    assert wd.drone_num == 3
    assert len(wd.waypoints_list) == 3
    for wps, n in zip(wd.waypoints_list, wd.n_points_list):
        assert len(wps) == n >= 2
        for p in wps:
            assert 0 <= p[0] <= 14 and 0 <= p[1] <= 14 and 0 <= p[2] <= 6

    out = str(tmp_path / "gen_test")
    wd.save(out)
    assert os.path.exists(os.path.join(out, "data_1.json"))
    assert os.path.exists(os.path.join(out, "E3d.npy"))

    from rvo3d_tpu.worlds import load_world_dir

    wd2 = load_world_dir(out)
    assert wd2.drone_num == 3
    assert wd2.e3d_safe is not None

    # the generated world steps in the env
    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env import DroneEnv
    from rvo3d_tpu.utils import waypoint_controller

    env = DroneEnv(wd2.spec(), EnvParams(num_drones=3))
    state, out_obs = env.reset1()
    for _ in range(5):
        a = waypoint_controller(state, env.world)
        state, out_obs = env.step1(state, a)
    assert np.isfinite(np.asarray(state.pos)).all()
