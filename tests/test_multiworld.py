"""Multi-scenario batching: stacked worlds, per-lane gathering, and lane
equivalence against single-world envs."""

import numpy as np
import pytest

import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env import DroneEnv
from rvo3d_tpu.env.state import make_world_spec
from rvo3d_tpu.worlds.multi import MultiWorldEnv, stack_worlds, worlds_for_lanes


def _spec(offset: float, wmax: int = 2):
    wps = [
        [[1.0 + offset, 2.0, 2.0]] + [[8.0, 2.0 + offset, 3.0]] * (wmax - 1),
        [[8.0, 8.0, 2.0]] + [[1.0 + offset, 8.0, 3.0]] * (wmax - 1),
    ]
    return make_world_spec(wps, [[5.0, 5.0, 4.0, 0.5 + offset / 10]],
                           [10, 10, 5])


def test_stack_pads_and_gathers():
    a, b = _spec(0.0, wmax=2), _spec(0.5, wmax=4)
    stacked = stack_worlds([a, b])
    assert stacked.waypoints.shape == (2, 2, 4, 3)
    lanes = worlds_for_lanes(stacked, jnp.array([1, 0, 1]))
    assert lanes.waypoints.shape == (3, 2, 4, 3)
    np.testing.assert_allclose(np.asarray(lanes.map_size[0]),
                               np.asarray(b.map_size))


def test_mismatched_drone_count_raises():
    a = _spec(0.0)
    c = make_world_spec([[[1, 1, 1], [5, 5, 3]]], [], [10, 10, 5])
    with pytest.raises(ValueError):
        stack_worlds([a, c])


def test_multiworld_lane_matches_single_world():
    a, b = _spec(0.0), _spec(0.7)
    p = EnvParams(num_drones=2)
    menv = MultiWorldEnv([a, b], [0, 1, 1, 0], p)
    state, out = menv.reset_batch()

    env_a = DroneEnv(a, p)
    env_b = DroneEnv(b, p)
    sa, _ = env_a.reset1()
    sb, _ = env_b.reset1()

    rng = np.random.default_rng(0)
    for t in range(6):
        acts = jnp.asarray(
            np.round(rng.uniform(-1, 1, (4, 2, 3)), 2), jnp.float32)
        state, out = menv.step_batch(state, acts)
        sa, oa = env_a.step1(sa, acts[0])
        sb, ob = env_b.step1(sb, acts[1])
        np.testing.assert_allclose(np.asarray(state.pos[0]),
                                   np.asarray(sa.pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.pos[1]),
                                   np.asarray(sb.pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.reward[0]),
                                   np.asarray(oa.reward), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.reward[1]),
                                   np.asarray(ob.reward), atol=1e-6)


def test_multiworld_trainer_epoch():
    """One train epoch over a mixed-scenario batch (2 worlds x 2 lanes)."""
    from rvo3d_tpu.algo.trainer import Trainer
    from rvo3d_tpu.config import Config, ModelConfig, TrainConfig

    a, b = _spec(0.0), _spec(0.7)
    stacked = stack_worlds([a, b])
    lanes = worlds_for_lanes(stacked, jnp.array([0, 1, 0, 1]))
    cfg = Config(
        env=EnvParams(num_drones=2),
        model=ModelConfig(rnn_hidden_dim=16, hidden_sizes_ac=(16, 16),
                          hidden_sizes_v=(16, 16)),
        train=TrainConfig(steps_per_epoch=6, train_pi_iters=2,
                          train_v_iters=2, num_envs=4, max_ep_len=30),
    )
    trainer = Trainer(cfg, a, lane_worlds=lanes)
    m = trainer.run_epoch()
    assert np.isfinite(m["mean_step_reward"])
    m2 = trainer.run_epoch()
    assert np.isfinite(m2["mean_step_reward"])


def test_reverse_routes_preserves_padding_invariant():
    """reverse_routes flips only the n_points valid waypoints and re-pads
    by repeating the NEW last one (make_world_spec's invariant), leaving
    n_points/route_len untouched — the scenario-variant generator behind
    cli train --multi_worlds 'name:rev'."""
    from rvo3d_tpu.worlds.multi import reverse_routes

    # drone 0: 3 valid waypoints padded to 4; drone 1: 4 valid
    spec = make_world_spec(
        [[[0, 0, 1], [1, 0, 1], [2, 0, 1]],
         [[5, 5, 1], [5, 6, 1], [5, 7, 1], [5, 8, 1]]],
        [], [10, 10, 5])
    rev = reverse_routes(spec)
    w = np.asarray(rev.waypoints)
    np.testing.assert_array_equal(w[0, :3], [[2, 0, 1], [1, 0, 1], [0, 0, 1]])
    np.testing.assert_array_equal(w[0, 3], [0, 0, 1])     # re-padded
    np.testing.assert_array_equal(
        w[1], [[5, 8, 1], [5, 7, 1], [5, 6, 1], [5, 5, 1]])
    np.testing.assert_array_equal(np.asarray(rev.n_points),
                                  np.asarray(spec.n_points))
    # route_len must genuinely be reversal-invariant: RECOMPUTE the
    # polyline length over the reversed valid waypoints and compare to the
    # spec's stored value (rev.route_len is the same array as spec's by
    # construction, so comparing those two would be tautological —
    # ADVICE r4)
    for i, k in enumerate(np.asarray(rev.n_points)):
        seg = np.diff(w[i, :k], axis=0)
        np.testing.assert_allclose(
            np.sqrt((seg ** 2).sum(-1)).sum(),
            np.asarray(spec.route_len)[i], rtol=1e-6)
    # double reversal is identity
    np.testing.assert_array_equal(
        np.asarray(reverse_routes(rev).waypoints),
        np.asarray(spec.waypoints))
