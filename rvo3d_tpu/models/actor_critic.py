"""Gaussian actor + critic over the shared neighbor encoder.

Mirrors rnn_ac / GaussianActor / Critic (reference:
train/policy/policy_rnn_ac.py:31-256):
  - shared rnn_Reader between actor and critic (both losses backprop into it)
  - actor MLP (256, 256) with ReLU hidden, Tanh output head -> mu
  - log_std is a free parameter initialized to -1 (policy_rnn_ac.py:198)
  - std = clamp(std_factor * exp(log_std) + 1e-6, 1e-4, 10)
    (policy_rnn_ac.py:221-222)
  - logp summed over the action axis
  - critic MLP (256, 256) -> scalar value
Dense layers use torch nn.Linear default init (uniform ±1/sqrt(fan_in) for
both weight and bias) so learning dynamics are comparable.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rvo3d_tpu.config import ModelConfig
from rvo3d_tpu.models.encoder import NeighborEncoder

LOG_2PI = 1.8378770664093453


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    features: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", torch_linear_kernel_init,
                       (x.shape[-1], self.features), self.param_dtype)
        fan_in = x.shape[-1]
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        b = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.features,), self.param_dtype,
        )
        dt = self.compute_dtype
        return x.astype(dt) @ k.astype(dt) + b.astype(dt)


class MLP(nn.Module):
    """ReLU-hidden MLP with configurable output activation
    (reference mlp(), policy_rnn_ac.py:10-17)."""

    sizes: Sequence[int]
    output_activation: str = "identity"  # 'tanh' | 'identity'
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, width in enumerate(self.sizes):
            x = TorchDense(width, name=f"dense_{i}",
                           param_dtype=self.param_dtype,
                           compute_dtype=self.compute_dtype)(x)
            if i < len(self.sizes) - 1:
                x = nn.relu(x)
            elif self.output_activation == "tanh":
                x = jnp.tanh(x)
        return x


class PolicyStep(NamedTuple):
    action: jnp.ndarray
    value: jnp.ndarray
    logp: jnp.ndarray
    mu: jnp.ndarray
    std: jnp.ndarray


class ActorCritic(nn.Module):
    cfg: ModelConfig
    act_dim: int = 3

    def setup(self):
        c = self.cfg
        # ModelConfig.param_dtype/compute_dtype: params normally stay f32
        # (optimizer numerics) while compute_dtype='bfloat16' runs every
        # matmul on the MXU's native format for inference/serving; outputs
        # are cast back to f32 before sampling/logp (see __call__).
        pdt = jnp.dtype(c.param_dtype)
        cdt = jnp.dtype(c.compute_dtype)
        self.encoder = NeighborEncoder(
            state_dim=c.state_dim,
            input_dim=c.rnn_input_dim,
            hidden_dim=c.rnn_hidden_dim,
            mode=c.rnn_mode,
            use_pallas=getattr(c, "use_pallas_gru", False),
            param_dtype=pdt,
            compute_dtype=cdt,
        )
        self.actor = MLP(tuple(c.hidden_sizes_ac) + (self.act_dim,),
                         output_activation="tanh",
                         param_dtype=pdt, compute_dtype=cdt)
        self.critic = MLP(tuple(c.hidden_sizes_v) + (1,),
                          output_activation="identity",
                          param_dtype=pdt, compute_dtype=cdt)
        self.log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, c.log_std_init, jnp.float32),
            (self.act_dim,),
        )

    def _features(self, obs_self, obs_nbr, obs_mask):
        return self.encoder(obs_self, obs_nbr, obs_mask)

    def _std(self, std_factor):
        std = std_factor * jnp.exp(self.log_std) + 1e-6
        return jnp.clip(std, 1e-4, 10.0)

    def __call__(self, obs_self, obs_nbr, obs_mask, std_factor: float = 1.0):
        """Returns (mu, std, value) — the full forward used for init.
        Outputs are f32 regardless of compute_dtype (sampling, logp and the
        env integration stay in f32)."""
        feat = self._features(obs_self, obs_nbr, obs_mask)
        mu = self.actor(feat).astype(jnp.float32)
        v = jnp.squeeze(self.critic(feat), -1).astype(jnp.float32)
        return mu, self._std(std_factor), v

    def step(self, key, obs_self, obs_nbr, obs_mask, std_factor: float = 1.0
             ) -> PolicyStep:
        """Sample an action + value + logp (reference rnn_ac.step,
        policy_rnn_ac.py:57-69)."""
        mu, std, v = self(obs_self, obs_nbr, obs_mask, std_factor)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        a = mu + std * eps
        logp = self.logp_of(mu, std, a)
        return PolicyStep(action=a, value=v, logp=logp, mu=mu, std=std)

    def logp(self, obs_self, obs_nbr, obs_mask, act, std_factor: float = 1.0):
        """Log-prob of given actions under the current policy (reference
        Actor.forward with act, policy_rnn_ac.py:178-188)."""
        mu, std, _ = self(obs_self, obs_nbr, obs_mask, std_factor)
        return self.logp_of(mu, std, act)

    def value(self, obs_self, obs_nbr, obs_mask):
        feat = self._features(obs_self, obs_nbr, obs_mask)
        return jnp.squeeze(self.critic(feat), -1)

    def entropy(self, std_factor: float = 1.0):
        std = self._std(std_factor)
        return jnp.sum(0.5 + 0.5 * LOG_2PI + jnp.log(std), axis=-1)

    @staticmethod
    def logp_of(mu, std, act):
        z = (act - mu) / std
        per_dim = -0.5 * z * z - jnp.log(std) - 0.5 * LOG_2PI
        return jnp.sum(per_dim, axis=-1)
