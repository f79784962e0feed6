"""Model equivalence vs torch: the masked lax.scan encoder must match
torch's GRU/biGRU/LSTM run over the ragged valid prefix exactly (the
reference's pad/pack machinery, policy_rnn_ac.py:129-168)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from rvo3d_tpu.config import ModelConfig
from rvo3d_tpu.models import ActorCritic
from rvo3d_tpu.models.encoder import NeighborEncoder

H = 32
NM = 10
IN = 9
SD = 12


def _copy_gru_weights(params_dir, t_rnn, reverse=False):
    suf = "_reverse" if reverse else ""
    w_ih = np.asarray(params_dir["w_ih"]).T  # [3H, in]
    w_hh = np.asarray(params_dir["w_hh"]).T
    with torch.no_grad():
        getattr(t_rnn, f"weight_ih_l0{suf}").copy_(torch.tensor(w_ih))
        getattr(t_rnn, f"weight_hh_l0{suf}").copy_(torch.tensor(w_hh))
        getattr(t_rnn, f"bias_ih_l0{suf}").copy_(
            torch.tensor(np.asarray(params_dir["b_ih"])))
        getattr(t_rnn, f"bias_hh_l0{suf}").copy_(
            torch.tensor(np.asarray(params_dir["b_hh"])))


def _make_batch(rng, lens):
    nbr = np.zeros((len(lens), NM, IN), np.float32)
    mask = np.zeros((len(lens), NM), bool)
    seqs = []
    for b, k in enumerate(lens):
        seq = rng.standard_normal((k, IN)).astype(np.float32)
        seqs.append(seq)
        if k > 0:
            nbr[b, NM - k:] = seq        # valid slots at the END of the axis
            mask[b, NM - k:] = True
    return nbr, mask, seqs


@pytest.mark.parametrize("mode", ["GRU", "biGRU", "LSTM"])
def test_encoder_matches_torch_ragged(mode):
    rng = np.random.default_rng(0)
    enc = NeighborEncoder(state_dim=SD, input_dim=IN, hidden_dim=H, mode=mode)
    lens = [3, 1, NM, 0, 5]
    nbr, mask, seqs = _make_batch(rng, lens)
    self_state = rng.standard_normal((len(lens), SD)).astype(np.float32)

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(self_state),
                      jnp.asarray(nbr), jnp.asarray(mask))
    out = enc.apply(params, jnp.asarray(self_state), jnp.asarray(nbr),
                    jnp.asarray(mask))

    p = params["params"]
    if mode == "GRU":
        t_rnn = torch.nn.GRU(IN, H, batch_first=True)
        _copy_gru_weights(p["fwd"], t_rnn)
    elif mode == "biGRU":
        t_rnn = torch.nn.GRU(IN, H, batch_first=True, bidirectional=True)
        _copy_gru_weights(p["fwd"], t_rnn)
        _copy_gru_weights(p["bwd"], t_rnn, reverse=True)
    else:
        t_rnn = torch.nn.LSTM(IN, H, batch_first=True)
        suf = ""
        with torch.no_grad():
            t_rnn.weight_ih_l0.copy_(torch.tensor(np.asarray(p["fwd"]["w_ih"]).T))
            t_rnn.weight_hh_l0.copy_(torch.tensor(np.asarray(p["fwd"]["w_hh"]).T))
            t_rnn.bias_ih_l0.copy_(torch.tensor(np.asarray(p["fwd"]["b_ih"])))
            t_rnn.bias_hh_l0.copy_(torch.tensor(np.asarray(p["fwd"]["b_hh"])))

    t_ln = torch.nn.LayerNorm(SD + H)
    with torch.no_grad():
        t_ln.weight.copy_(torch.tensor(np.asarray(p["ln"]["scale"])))
        t_ln.bias.copy_(torch.tensor(np.asarray(p["ln"]["bias"])))

    # reference path: run each ragged sequence through torch singly
    # (obs_rnn semantics, policy_rnn_ac.py:102-127); k=0 -> one zero row
    for b, seq in enumerate(seqs):
        x = seq if len(seq) > 0 else np.zeros((1, IN), np.float32)
        xt = torch.tensor(x).unsqueeze(0)
        if mode == "LSTM":
            _, (hn, _) = t_rnn(xt)
        else:
            _, hn = t_rnn(xt)
        hnv = hn.squeeze(1)
        if mode == "biGRU":
            hnv = hnv.sum(0)
        else:
            hnv = hnv.squeeze(0)
        ref = t_ln(torch.cat([torch.tensor(self_state[b]), hnv]))
        np.testing.assert_allclose(
            np.asarray(out[b]), ref.detach().numpy(), atol=2e-5,
            err_msg=f"mode={mode} batch={b} len={len(seq)}",
        )


def test_actor_critic_shapes_and_logp():
    cfg = ModelConfig(rnn_hidden_dim=H, hidden_sizes_ac=(32, 32),
                      hidden_sizes_v=(32, 32))
    ac = ActorCritic(cfg)
    rng = np.random.default_rng(1)
    B = 7
    obs_self = jnp.asarray(rng.standard_normal((B, SD)), jnp.float32)
    obs_nbr = jnp.asarray(rng.standard_normal((B, NM, IN)), jnp.float32)
    mask = jnp.asarray(rng.random((B, NM)) > 0.5)

    params = ac.init(jax.random.PRNGKey(0), obs_self, obs_nbr, mask)
    mu, std, v = ac.apply(params, obs_self, obs_nbr, mask)
    assert mu.shape == (B, 3) and v.shape == (B,)
    assert np.all(np.abs(np.asarray(mu)) <= 1.0)          # tanh head
    np.testing.assert_allclose(np.asarray(std), np.exp(-1.0) + 1e-6,
                               rtol=1e-5)                  # log_std init -1

    step = ac.apply(params, jax.random.PRNGKey(2), obs_self, obs_nbr, mask,
                    method=ActorCritic.step)
    # logp must match torch.distributions.Normal
    dist = torch.distributions.Normal(
        torch.tensor(np.asarray(mu)), torch.tensor(np.asarray(std)))
    ref_logp = dist.log_prob(torch.tensor(np.asarray(step.action))).sum(-1)
    np.testing.assert_allclose(np.asarray(step.logp), ref_logp.numpy(),
                               atol=1e-5)

    # eval-time std_factor shrinks the std (post_train.py:27)
    _, std_eval, _ = ac.apply(params, obs_self, obs_nbr, mask, 1e-3)
    assert np.all(np.asarray(std_eval) < 1e-3)


def test_encoder_empty_equals_single_zero_row():
    """k=0 must equal a length-1 zero sequence, not a skipped RNN."""
    enc = NeighborEncoder(state_dim=SD, input_dim=IN, hidden_dim=H, mode="GRU")
    z_nbr = jnp.zeros((1, NM, IN))
    m_empty = jnp.zeros((1, NM), bool)
    m_onezero = jnp.zeros((1, NM), bool).at[0, NM - 1].set(True)
    s = jnp.ones((1, SD))
    params = enc.init(jax.random.PRNGKey(0), s, z_nbr, m_empty)
    out_empty = enc.apply(params, s, z_nbr, m_empty)
    out_zero = enc.apply(params, s, z_nbr, m_onezero)
    np.testing.assert_allclose(np.asarray(out_empty), np.asarray(out_zero))


def test_bf16_compute_dtype_inference():
    """ModelConfig.compute_dtype='bfloat16' runs the matmul stack in bf16
    (MXU-native) and returns f32 outputs close to the f32 forward; params
    stay f32 (param_dtype default) so checkpoints are interchangeable."""
    from rvo3d_tpu.config import ModelConfig
    from rvo3d_tpu.models import ActorCritic

    B, NM_, SD_, IN_ = 16, 5, 12, 9
    key = jax.random.PRNGKey(3)
    obs_self = jax.random.normal(key, (B, SD_))
    obs_nbr = jax.random.normal(jax.random.PRNGKey(4), (B, NM_, IN_))
    mask = jax.random.bernoulli(jax.random.PRNGKey(5), 0.7, (B, NM_))

    ac32 = ActorCritic(ModelConfig())
    params = ac32.init(jax.random.PRNGKey(0), obs_self, obs_nbr, mask)
    mu32, _, v32 = ac32.apply(params, obs_self, obs_nbr, mask)

    ac16 = ActorCritic(ModelConfig(compute_dtype="bfloat16"))
    mu16, _, v16 = ac16.apply(params, obs_self, obs_nbr, mask)

    assert mu16.dtype == jnp.float32 and v16.dtype == jnp.float32
    # params are f32 in both (same tree — interchangeable checkpoints)
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32), atol=0.05)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32), atol=0.2)
