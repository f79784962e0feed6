"""Fixed-seed parity: vectorized JAX env vs the NumPy oracle.

This is the project's north-star check (BASELINE.md): identical
trajectories, rewards, observations, and episode flags on the reference's
shipped world fixtures under scripted action sequences.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env.env import DroneEnv, observe, reset, step
from rvo3d_tpu.env.oracle import OracleEnv
from rvo3d_tpu.worlds import load_world

WORLDS = ["world_2", "world_3", "world_4", "world_8", "world_2_cross"]


def make_actions(rng, n, scale=1.0):
    # mimic the trainer's rounded increments: abs = 0.5*round(a,2) + vel
    return np.round(rng.uniform(-1, 1, size=(n, 3)) * scale, 2)


def flat_obs_from_out(out, nm):
    self_o = np.asarray(out.obs_self)
    nbr = np.asarray(out.obs_nbr)
    mask = np.asarray(out.obs_mask)
    obs_list = []
    for i in range(self_o.shape[0]):
        blocks = [nbr[i, j] for j in range(nm) if mask[i, j]]
        if blocks:
            obs_list.append(np.concatenate([self_o[i]] + blocks))
        else:
            obs_list.append(np.concatenate([self_o[i], np.zeros(9)]))
    return obs_list


@pytest.mark.parametrize("world_name", WORLDS)
def test_step_parity(world_name, reference_worlds_available):
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")
    wd = load_world(world_name)
    params = EnvParams(num_drones=wd.drone_num)
    spec = wd.spec(dtype=np.float32)
    oracle = OracleEnv(wd)

    state = reset(spec, params)
    oracle.reset()

    rng = np.random.default_rng(7)
    n = wd.drone_num
    T = 120

    jstep = jax.jit(lambda s, a: step(spec, s, a, params))

    for t in range(T):
        # follow a noisy desired-velocity policy so drones actually interact
        des = np.stack([d.cal_des_vel() for d in oracle.drones])
        acts = np.round(des + 0.3 * rng.standard_normal((n, 3)), 2)

        o_obs, o_rew, o_done, o_info, o_fin = oracle.step(acts)
        state, out = jstep(state, jnp.asarray(acts, jnp.float32))

        np.testing.assert_allclose(
            np.asarray(state.pos), np.stack([d.state for d in oracle.drones]),
            atol=2e-5, rtol=0, err_msg=f"pos mismatch at t={t}",
        )
        np.testing.assert_allclose(
            np.asarray(state.vel), np.stack([d.vel for d in oracle.drones]),
            atol=2e-5, err_msg=f"vel mismatch at t={t}",
        )
        assert np.array_equal(np.asarray(out.done), np.array(o_done)), t
        assert np.array_equal(np.asarray(out.info_arrive), np.array(o_info)), t
        assert np.array_equal(np.asarray(out.finish), np.array(o_fin)), t
        np.testing.assert_allclose(
            np.asarray(out.reward), np.array(o_rew), atol=5e-3,
            err_msg=f"reward mismatch at t={t}",
        )
        jobs = flat_obs_from_out(out, params.neighbor_num)
        for i in range(n):
            assert jobs[i].shape == o_obs[i].shape, (t, i, jobs[i], o_obs[i])
            np.testing.assert_allclose(
                jobs[i], o_obs[i], atol=2e-2,
                err_msg=f"obs mismatch t={t} drone={i}",
            )

        # mirror per-drone collision resets so the rollout continues
        if any(o_done):
            mask = np.array(o_done)
            for i in range(n):
                if mask[i]:
                    oracle.reset_one(i)
            from rvo3d_tpu.env.env import reset_where

            state = reset_where(spec, state, jnp.asarray(mask))
        if all(o_fin):
            oracle.reset()
            state = reset(spec, params)


@pytest.mark.parametrize("world_name", ["world_3"])
def test_observe_parity(world_name, reference_worlds_available):
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")
    wd = load_world(world_name)
    params = EnvParams(num_drones=wd.drone_num)
    spec = wd.spec(dtype=np.float32)
    oracle = OracleEnv(wd)
    o_obs = oracle.reset()
    state = reset(spec, params)
    out, state = observe(spec, state, params)
    jobs = flat_obs_from_out(out, params.neighbor_num)
    for i in range(wd.drone_num):
        np.testing.assert_allclose(jobs[i], o_obs[i], atol=2e-2)


def test_vmap_equivalence(reference_worlds_available):
    """Lane e of a vmapped batch must equal a solo env fed the same actions."""
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")
    wd = load_world("world_3")
    params = EnvParams(num_drones=wd.drone_num)
    spec = wd.spec(dtype=np.float32)
    env = DroneEnv(spec, params, num_envs=4)

    state_b, _ = env.reset_batch()
    state_1, _ = env.reset1()

    rng = np.random.default_rng(3)
    acts_b = jnp.asarray(
        np.round(rng.uniform(-1, 1, size=(5, 4, wd.drone_num, 3)), 2),
        jnp.float32,
    )
    for t in range(5):
        state_b, out_b = env.step_batch(state_b, acts_b[t])
        state_1, out_1 = env.step1(state_1, acts_b[t, 2])
        np.testing.assert_allclose(
            np.asarray(state_b.pos[2]), np.asarray(state_1.pos), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_b.reward[2]), np.asarray(out_1.reward), atol=1e-6
        )
