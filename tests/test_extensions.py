"""Tests for the extension modules: dynamic sphere obstacles, the classic
RVO grid-search controller, and the Euler/Ackermann motion models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env.env import DroneEnv, reset, reset_where, step
from rvo3d_tpu.env.motion_models import (ackermann_preview, ackermann_step,
                                         euler_rotation, motion_euler,
                                         motion_omni)
from rvo3d_tpu.env.obstacles import (GOAL, LINEAR, STATIC, inside_sphere,
                                     make_sphere_spec, predict_states)
from rvo3d_tpu.env.state import make_world_spec
from rvo3d_tpu.utils import waypoint_controller


def _world_with_spheres(spheres):
    wps = [
        [[1.0, 5.0, 2.0], [9.0, 5.0, 2.0]],
        [[9.0, 5.5, 2.0], [1.0, 5.5, 2.0]],
    ]
    return make_world_spec(wps, [], [10, 10, 5], spheres=spheres)


def test_sphere_models_move_correctly():
    world = _world_with_spheres([
        {"pos": (5, 5, 2), "radius": 0.5, "model": "static"},
        {"pos": (2, 2, 2), "vel": (0.5, 0, 0), "radius": 0.4,
         "model": "linear"},
        {"pos": (8, 8, 2), "vel": (1, 0, 0), "radius": 0.3,
         "goal": (8, 2, 2), "model": "goal"},
    ])
    p = EnvParams(num_drones=2)
    state = reset(world, p)
    act = jnp.zeros((2, 3))
    for _ in range(4):
        state, out = step(world, state, act, p)
    sp = np.asarray(state.sphere_pos)
    np.testing.assert_allclose(sp[0], [5, 5, 2], atol=1e-6)  # static holds
    assert sp[1, 0] > 2.0                                     # linear moved +x
    assert sp[2, 1] < 8.0                                     # goal-seeker moved -y
    # goal-seeker moves toward its goal at |v_init| speed
    v2 = np.asarray(state.sphere_vel[2])
    assert np.linalg.norm(v2) == pytest.approx(1.0, abs=1e-5)


def test_linear_sphere_bounces():
    world = _world_with_spheres([
        {"pos": (9.5, 5, 2), "vel": (1.0, 0, 0), "radius": 0.4,
         "model": "linear"},
    ])
    p = EnvParams(num_drones=2)
    state = reset(world, p)
    act = jnp.zeros((2, 3))
    state, _ = step(world, state, act, p)
    assert float(state.sphere_vel[0, 0]) < 0  # reflected at the +x wall


def test_sphere_collision_and_obs():
    """A sphere sitting on drone 0's start collides; obs includes it."""
    world = _world_with_spheres([
        {"pos": (1.2, 5.0, 2.0), "radius": 0.3, "model": "static"},
    ])
    p = EnvParams(num_drones=2)
    state = reset(world, p)
    state, out = step(world, state, jnp.zeros((2, 3)), p)
    assert bool(out.done[0])      # overlap: dis 0.2 <= 0.2 + 0.3
    assert not bool(out.done[1])
    assert float(out.reward[0]) <= -45.0


def test_sphere_persists_through_partial_reset():
    world = _world_with_spheres([
        {"pos": (5, 5, 2), "vel": (0.3, 0, 0), "radius": 0.4,
         "model": "linear"},
    ])
    p = EnvParams(num_drones=2)
    state = reset(world, p)
    state, _ = step(world, state, jnp.zeros((2, 3)), p)
    moved = np.asarray(state.sphere_pos).copy()
    # partial reset keeps the sphere where it is
    state2 = reset_where(world, state, jnp.array([True, False]))
    np.testing.assert_allclose(np.asarray(state2.sphere_pos), moved)
    # full reset returns it to the initial position
    state3 = reset_where(world, state, jnp.array([True, True]))
    np.testing.assert_allclose(np.asarray(state3.sphere_pos)[0], [5, 5, 2],
                               atol=1e-6)


def test_inside_sphere_and_prediction():
    assert bool(inside_sphere(jnp.array([1.0, 0, 0]),
                              jnp.array([0.0, 0, 0]), jnp.array(1.5)))
    assert not bool(inside_sphere(jnp.array([2.0, 0, 0]),
                                  jnp.array([0.0, 0, 0]), jnp.array(1.5)))
    preds = predict_states(jnp.array([[0.0, 0, 0]]),
                           jnp.array([[1.0, 0, 0]]),
                           jnp.array([0.5]), dt=1.0, receding=3)
    assert preds.shape == (4, 1, 4)
    np.testing.assert_allclose(np.asarray(preds[3, 0]), [3, 0, 0, 0.5])


def test_rvo_velocity_dodges_imminent_head_on():
    """A drone closing head-on with a neighbor: the desired velocity sits
    inside the RVO cone, so the grid search must pick something else that
    clears the conflict."""
    from rvo3d_tpu.env.rvo_policy import rvo_controller, rvo_velocity

    wps = [
        [[1.0, 5.0, 2.0], [9.0, 5.0, 2.0]],
        [[9.0, 5.05, 2.0], [1.0, 5.05, 2.0]],
    ]
    world = make_world_spec(wps, [], [10, 10, 5])
    p = EnvParams(num_drones=2)
    state = reset(world, p)
    # imminent conflict: 1.6 apart, closing at 1.6/s
    state = state._replace(
        pos=jnp.array([[4.0, 5.0, 2.0], [5.6, 5.05, 2.0]]),
        vel=jnp.array([[0.8, 0.0, 0.0], [-0.8, 0.0, 0.0]]),
    )
    v = rvo_velocity(world, state, p)
    des0 = jnp.array([1.0, 0.0, 0.0])  # straight at the neighbor
    # chosen velocity must deviate from the pure head-on desired direction
    dev = float(jnp.linalg.norm(v[0] - des0 * jnp.linalg.norm(v[0])))
    assert dev > 1e-3, f"controller kept the head-on velocity {v[0]}"

    # and stepping the closed loop stays collision-free
    import jax

    @jax.jit
    def loop_step(state):
        a = rvo_controller(state, world, p)
        return step(world, state, a, p)

    for _ in range(30):
        state, out = loop_step(state)
        assert not bool(out.done.any()), "rvo controller collided"
        if bool(out.finish.all()):
            break


def test_motion_models():
    # omni
    s = motion_omni(jnp.array([1.0, 2.0, 3.0]), jnp.array([0.5, 0, -0.5]), 2.0)
    np.testing.assert_allclose(np.asarray(s), [2.0, 2.0, 2.0])
    # euler rotation: yaw 90deg sends +x body to +y world
    R = euler_rotation(0.0, 0.0, 90.0)
    v = R @ jnp.array([1.0, 0, 0])
    np.testing.assert_allclose(np.asarray(v), [0, 1, 0], atol=1e-6)
    # euler motion integrates in world frame
    pos, ang = motion_euler(jnp.array([0.0, 0, 0]),
                            jnp.array([0.0, 0.0, 90.0]),
                            jnp.array([1.0, 0, 0]), dt=1.0)
    np.testing.assert_allclose(np.asarray(pos), [0, 1, 0], atol=1e-6)
    # ackermann preview: straight line when psi=0
    out = ackermann_preview(jnp.array([0.0, 0, 0, 0]), vel=1.0, psi=0.0,
                            pre_time=1.0, dt=0.1)
    np.testing.assert_allclose(float(out[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(out[1]), 0.0, atol=1e-6)
    # ackermann discrete step: straight
    s2 = ackermann_step(jnp.array([0.0, 0.0, 0.0]), gear=1.0, steer=0.0,
                        step_size=0.5)
    np.testing.assert_allclose(np.asarray(s2), [0.5, 0, 0], atol=1e-4)
    # arc step turns
    s3 = ackermann_step(jnp.array([0.0, 0.0, 0.0]), gear=1.0, steer=1.0,
                        step_size=0.5, min_radius=1.0)
    assert float(s3[2]) > 0  # heading increased (left turn)


def test_env_with_spheres_still_vmaps():
    world = _world_with_spheres([
        {"pos": (5, 5, 2), "vel": (0.2, 0.1, 0), "radius": 0.4,
         "model": "linear"},
    ])
    p = EnvParams(num_drones=2)
    env = DroneEnv(world, p, num_envs=3)
    state, out = env.reset_batch()
    acts = jnp.zeros((3, 2, 3))
    state, out = env.step_batch(state, acts)
    assert state.sphere_pos.shape == (3, 1, 3)
    assert np.isfinite(np.asarray(out.reward)).all()


def test_rvo_velocity_arrival_slowdown():
    """slowdown=True aims to LAND on the active waypoint when one step
    away, instead of the env's max-speed unit des_vel (drone.py:199-210)
    which at dt=1 can overfly the 0.4 goal ball every step and orbit
    forever (measured: world16_dense drone 4, gridlocked 500 steps at
    every margin while 15/16 drones finished — runs/bc_evals/
    expert_margin_sweep.txt). Off by default: world_8's recipe breaks
    with it."""
    from rvo3d_tpu.env.rvo_policy import rvo_velocity

    # one drone 0.45 before its goal: full-speed des_vel overshoots to
    # 0.55 on the far side; the landing velocity has norm 0.45
    world = make_world_spec([[[1.0, 5.0, 2.0], [1.45, 5.0, 2.0]]], [],
                            [20, 20, 5])
    p = EnvParams(num_drones=1)
    state = reset(world, p)
    v_fast = rvo_velocity(world, state, p)
    v_slow = rvo_velocity(world, state, p, slowdown=True)
    n_fast = float(jnp.linalg.norm(v_fast[0]))
    n_slow = float(jnp.linalg.norm(v_slow[0]))
    # candidate grid spacing is 0.25: fast picks ~1.0, slow picks 0.5
    assert n_fast >= 0.95, n_fast
    assert n_slow <= 0.55, n_slow
    # landed position is inside the goal threshold, overshoot is not
    assert abs(1.0 + n_slow - 1.45) < p.goal_threshold
    assert abs(1.0 + n_fast - 1.45) > p.goal_threshold
