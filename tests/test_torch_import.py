"""Reference-checkpoint interop: load the shipped trained policies and
verify my ActorCritic reproduces the torch module's outputs exactly —
the migration-path parity check for real trained artifacts."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import ModelConfig
from rvo3d_tpu.models import ActorCritic

CKPT = "/root/reference/train/model_save/r8_0/r8_0_1200.pt"


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="reference checkpoints not present")
def test_reference_checkpoint_forward_parity():
    import torch

    from rvo3d_tpu.utils.torch_import import (
        _install_gym_stub, load_reference_policy, REFERENCE_TRAIN_DIR,
    )

    params = load_reference_policy(CKPT, rnn_mode="biGRU")
    cfg = ModelConfig(rnn_hidden_dim=256, hidden_sizes_ac=(256, 256),
                      hidden_sizes_v=(256, 256), rnn_mode="biGRU")
    ac = ActorCritic(cfg)

    # torch reference module (unpickled via the gym stub)
    import sys
    _install_gym_stub()
    if REFERENCE_TRAIN_DIR not in sys.path:
        sys.path.append(REFERENCE_TRAIN_DIR)
    t_ac = torch.load(CKPT, map_location="cpu", weights_only=False)
    t_ac.use_gpu = False
    t_ac.pi.use_gpu = False
    t_ac.pi.rnn_reader.use_gpu = False
    t_ac.eval()

    rng = np.random.default_rng(0)
    NM = 10
    for k in [0, 1, 4, NM]:
        self_state = rng.standard_normal(12).astype(np.float32)
        seq = rng.standard_normal((k, 9)).astype(np.float32)
        flat_obs = np.concatenate([self_state] +
                                  ([seq.ravel()] if k else [np.zeros(9, np.float32)]))

        with torch.no_grad():
            t_obs = torch.tensor(flat_obs)
            t_feat = t_ac.pi.rnn_reader.obs_rnn(t_obs)
            t_mu = t_ac.pi.net_out(t_feat).numpy()
            t_v = t_ac.v(t_obs).numpy()

        nbr = np.zeros((1, NM, 9), np.float32)
        mask = np.zeros((1, NM), bool)
        if k:
            nbr[0, NM - k:] = seq
            mask[0, NM - k:] = True
        mu, std, v = ac.apply(params, jnp.asarray(self_state[None]),
                              jnp.asarray(nbr), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(mu[0]), t_mu, atol=2e-5,
                                   err_msg=f"mu mismatch k={k}")
        np.testing.assert_allclose(np.asarray(v[0]), t_v, atol=2e-4,
                                   err_msg=f"v mismatch k={k}")

    np.testing.assert_allclose(
        np.asarray(params["params"]["log_std"]),
        t_ac.pi.log_std.detach().numpy(), atol=1e-7,
    )
