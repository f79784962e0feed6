"""Behavior-cloning warm start: demo collection shapes, loss reduction,
and that the cloned policy actually moves (escapes the brake attractor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvo3d_tpu.algo.bc import bc_pretrain, collect_demos
from rvo3d_tpu.config import EnvParams, ModelConfig
from rvo3d_tpu.models import ActorCritic
from rvo3d_tpu.env.state import make_world_spec


@pytest.fixture(scope="module")
def world():
    wps = [
        [[1.0, 5.0, 2.0], [8.0, 5.0, 2.5]],
        [[8.0, 6.0, 2.0], [1.0, 6.0, 2.5]],
    ]
    return make_world_spec(wps, [], [10, 10, 5])


def test_collect_demos_shapes(world):
    p = EnvParams(num_drones=2)
    os_, on_, om_, tg_ = collect_demos(world, p, num_envs=3, steps=5,
                                       key=jax.random.PRNGKey(0),
                                       action_mode="direct")
    assert os_.shape == (30, 12)
    assert on_.shape == (30, 10, 9)
    assert om_.shape == (30, 10)
    assert tg_.shape == (30, 3)
    assert np.all(np.abs(np.asarray(tg_)) <= 0.999)


@pytest.mark.parametrize("mode", ["direct", "increment"])
def test_bc_reduces_loss_and_moves(world, mode):
    p = EnvParams(num_drones=2)
    ac = ActorCritic(ModelConfig(rnn_hidden_dim=16, hidden_sizes_ac=(16, 16),
                                 hidden_sizes_v=(16, 16)))
    params0 = ac.init(jax.random.PRNGKey(0), jnp.zeros((1, 12)),
                      jnp.zeros((1, 10, 9)), jnp.zeros((1, 10), bool))
    params, loss = bc_pretrain(ac, params0, world, p,
                               jax.random.PRNGKey(1), num_envs=4,
                               demo_steps=30, train_steps=200, batch=256,
                               action_mode=mode)
    assert loss < 0.1, f"BC loss did not converge in {mode}: {loss}"

    # the cloned policy commands positive acceleration from rest (the tiny
    # test model underfits the rare rest state, so only the sign is stable)
    from rvo3d_tpu.env.env import DroneEnv

    env = DroneEnv(world, p)
    s, out = env.reset1()
    mu, _, _ = ac.apply(params, out.obs_self, out.obs_nbr, out.obs_mask)
    assert float(mu[0, 0]) > 0.0, f"no acceleration from rest: {mu[0]}"


def test_bc_pretrain_multi_world_mixed_set():
    """bc_pretrain accepts a SEQUENCE of worlds and fits one aggregate
    demo set (multi-scenario warm start; sequential per-scenario fits
    left an ordering bias — runs/w32_multi). Checks the single-world path
    is the degenerate case and params move."""
    import jax

    from rvo3d_tpu.algo.bc import bc_pretrain
    from rvo3d_tpu.algo.trainer import Trainer
    from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
    from rvo3d_tpu.worlds import load_world
    from rvo3d_tpu.worlds.multi import reverse_routes

    wd = load_world("world_3")
    spec = wd.spec()
    cfg = Config(env=EnvParams(num_drones=wd.drone_num),
                 model=ModelConfig(rnn_hidden_dim=32,
                                   hidden_sizes_ac=(32, 32),
                                   hidden_sizes_v=(32, 32)),
                 train=TrainConfig(action_mode="direct", num_envs=4))
    tr = Trainer(cfg, spec)
    params, loss = bc_pretrain(
        tr.ac, tr.ppo_state.params, [spec, reverse_routes(spec)], cfg.env,
        jax.random.PRNGKey(0), num_envs=4, demo_steps=10, train_steps=20,
        expert="rvo", action_mode="direct", dagger_rounds=1)
    assert np.isfinite(loss)
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(tr.ppo_state.params),
                        jax.tree_util.tree_leaves(params)))
    assert moved


def test_collect_demos_env_noise_widens_states(world):
    """env_noise=True (cli --bc_env_noise) steps demos under the eval's
    control-noise channel: trajectories diverge from the clean rollout
    (distinct visited states per lane), labels stay finite, and
    env_noise=False is unchanged by the flag's existence."""
    p = EnvParams(num_drones=2, control_std=0.06)
    key = jax.random.PRNGKey(3)
    clean = collect_demos(world, p, num_envs=3, steps=8, key=key,
                          expert="rvo", action_mode="direct")
    noisy = collect_demos(world, p, num_envs=3, steps=8, key=key,
                          expert="rvo", action_mode="direct", env_noise=True)
    for c, n in zip(clean, noisy):
        assert np.all(np.isfinite(np.asarray(c, np.float64)))
        assert np.all(np.isfinite(np.asarray(n, np.float64)))
    # the clean rollout's lanes are identical (broadcast reset, no DART),
    # the noisy rollout's lanes must differ from each other AND from clean
    obs_c = np.asarray(clean[0]).reshape(8, 3, 2, -1)
    obs_n = np.asarray(noisy[0]).reshape(8, 3, 2, -1)
    assert np.allclose(obs_c[:, 0], obs_c[:, 1])
    assert not np.allclose(obs_n[:, 0], obs_n[:, 1])
    assert not np.allclose(obs_c, obs_n)
