"""PolicyServer: checkpoint loading (orbax + reference torch) and batched
inference, including the reference's flat concatenated obs layout
(counterpart of post_train.load_policy, post_train.py:131-153)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
from rvo3d_tpu.models import ActorCritic
from rvo3d_tpu.serving import PolicyServer

TORCH_CKPT = "/root/reference/train/model_save/r8_0/r8_0_1200.pt"


def tiny_cfg(world="world_2"):
    return Config(
        world=world,
        env=EnvParams(num_drones=2),
        model=ModelConfig(rnn_hidden_dim=16, hidden_sizes_ac=(16,),
                          hidden_sizes_v=(16,)),
        train=TrainConfig(num_envs=2, steps_per_epoch=4),
    )


def rand_obs(rng, b, nm, k):
    obs_self = rng.normal(size=(b, 12)).astype(np.float32)
    nbr = np.zeros((b, nm, 9), np.float32)
    mask = np.zeros((b, nm), bool)
    nbr[:, nm - k:] = rng.normal(size=(b, k, 9)).astype(np.float32)
    mask[:, nm - k:] = True
    return obs_self, nbr, mask


def test_from_orbax_roundtrip(tmp_path, reference_worlds_available):
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")
    from rvo3d_tpu.algo.trainer import Trainer
    from rvo3d_tpu.utils.checkpoint import save_checkpoint
    from rvo3d_tpu.worlds import load_world

    import json

    from rvo3d_tpu.config import to_dict

    cfg = tiny_cfg()
    wd = load_world(cfg.world)
    trainer = Trainer(cfg, wd.spec())
    run_dir = str(tmp_path / "run")
    save_checkpoint(os.path.join(run_dir, "ckpt"), 0, trainer.ppo_state, cfg)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(to_dict(cfg), f)  # cli train writes this at run-dir root

    srv = PolicyServer.from_orbax(run_dir)
    rng = np.random.default_rng(0)
    obs_self, nbr, mask = rand_obs(rng, 5, srv.nm, 3)
    acts = srv.act(obs_self, nbr, mask)
    assert acts.shape == (5, 3) and np.isfinite(acts).all()

    # deterministic mode = the policy mean, reproducible across calls
    np.testing.assert_array_equal(acts, srv.act(obs_self, nbr, mask))

    # matches a direct forward through the restored params
    mu, _, _ = srv.ac.apply(srv.params, jnp.asarray(obs_self),
                            jnp.asarray(nbr), jnp.asarray(mask))
    np.testing.assert_allclose(acts, np.asarray(mu), atol=1e-6)


def test_act_flat_matches_structured():
    # independent of checkpoints: random params, both obs layouts agree
    ac = ActorCritic(ModelConfig(rnn_hidden_dim=16, hidden_sizes_ac=(16,),
                                 hidden_sizes_v=(16,)))
    rng = np.random.default_rng(1)
    nm, b, k = 10, 4, 2
    obs_self, nbr, mask = rand_obs(rng, b, nm, k)
    params = ac.init(jax.random.PRNGKey(0), jnp.asarray(obs_self),
                     jnp.asarray(nbr), jnp.asarray(mask))
    srv = PolicyServer(ac, params, nm=nm)

    flat = np.concatenate([obs_self, nbr[:, nm - k:].reshape(b, -1)], axis=1)
    np.testing.assert_allclose(srv.act_flat(flat),
                               srv.act(obs_self, nbr, mask), atol=1e-6)

    # the reference's zero-fill rule: no neighbors -> one zero block, which
    # act_flat must treat as padding (models handle the empty sequence)
    flat0 = np.concatenate([obs_self, np.zeros((b, 9), np.float32)], axis=1)
    acts0 = srv.act_flat(flat0)
    nbr0 = np.zeros((b, nm, 9), np.float32)
    mask0 = np.zeros((b, nm), bool)
    np.testing.assert_allclose(acts0, srv.act(obs_self, nbr0, mask0),
                               atol=1e-6)


@pytest.mark.skipif(not os.path.exists(TORCH_CKPT),
                    reason="reference checkpoints not present")
def test_from_torch_reference_checkpoint():
    srv = PolicyServer.from_torch(TORCH_CKPT)
    rng = np.random.default_rng(2)
    obs_self, nbr, mask = rand_obs(rng, 3, srv.nm, 4)
    acts = srv.act(obs_self, nbr, mask)
    assert acts.shape == (3, 3) and np.isfinite(acts).all()
