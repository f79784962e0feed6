"""Policy serving: load any checkpoint format, run low-latency batched
inference.

The production-facing counterpart of post_train.load_policy (reference:
train/policy/post_train.py:131-153), which returned a per-call torch
closure. Here the policy is a jitted, shape-specialized function over
batched observations; deterministic mode uses the evaluator's std_factor
semantics (post_train.py:27).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rvo3d_tpu.config import ModelConfig
from rvo3d_tpu.models import ActorCritic


class PolicyServer:
    """Batched action server.

    from_orbax(run_dir)       — framework checkpoints (cli train output)
    from_torch(path)          — the reference's .pt checkpoints
    act(obs_self, obs_nbr, obs_mask [, key]) -> actions [B, 3]
    act_flat(obs [B, 12+9*nm]) — the reference's concatenated obs layout
    """

    def __init__(self, ac: ActorCritic, params, nm: int = 10,
                 std_factor: float = 1e-3, deterministic: bool = True):
        self.ac = ac
        self.params = params
        self.nm = nm
        self.std_factor = std_factor
        self.deterministic = deterministic

        @jax.jit
        def _mu(params, obs_self, obs_nbr, obs_mask):
            mu, _, v = ac.apply(params, obs_self, obs_nbr, obs_mask)
            return mu, v

        @functools.partial(jax.jit, static_argnames=())
        def _sample(params, key, obs_self, obs_nbr, obs_mask):
            ps = ac.apply(params, key, obs_self, obs_nbr, obs_mask,
                          std_factor, method=ActorCritic.step)
            return ps.action, ps.value

        self._mu = _mu
        self._sample = _sample

    @classmethod
    def from_orbax(cls, run_dir: str, **kw) -> "PolicyServer":
        from rvo3d_tpu.algo.trainer import Trainer
        from rvo3d_tpu.utils.checkpoint import load_config, restore_checkpoint
        from rvo3d_tpu.worlds import load_world
        import os

        cfg = load_config(run_dir)
        wd = load_world(cfg.world)
        trainer = Trainer(cfg, wd.spec())
        state, _ = restore_checkpoint(os.path.join(run_dir, "ckpt"),
                                      trainer.ppo_state)
        return cls(trainer.ac, state.params, nm=cfg.env.neighbor_num, **kw)

    @classmethod
    def from_torch(cls, path: str, rnn_mode: str = "biGRU", **kw
                   ) -> "PolicyServer":
        from rvo3d_tpu.utils.torch_import import load_reference_policy

        params = load_reference_policy(path, rnn_mode=rnn_mode)
        ac = ActorCritic(ModelConfig(rnn_mode=rnn_mode))
        return cls(ac, params, **kw)

    def act(self, obs_self, obs_nbr, obs_mask,
            key: Optional[jax.Array] = None) -> np.ndarray:
        if self.deterministic:
            mu, _ = self._mu(self.params, obs_self, obs_nbr, obs_mask)
            return np.asarray(mu)
        assert key is not None
        a, _ = self._sample(self.params, key, obs_self, obs_nbr, obs_mask)
        return np.asarray(a)

    def act_flat(self, obs: np.ndarray,
                 key: Optional[jax.Array] = None) -> np.ndarray:
        """obs [B, 12 + 9*k] in the reference's concatenated layout (k may
        be ragged per call but fixed within a batch)."""
        obs = np.asarray(obs, np.float32)
        b = obs.shape[0]
        self_state = jnp.asarray(obs[:, :12])
        rest = obs[:, 12:]
        k = rest.shape[1] // 9
        nbr = np.zeros((b, self.nm, 9), np.float32)
        mask = np.zeros((b, self.nm), bool)
        if k > 0:
            blocks = rest.reshape(b, k, 9)
            active = ~np.all(blocks == 0, axis=-1)        # zero rows = padding
            nbr[:, self.nm - k:] = blocks
            mask[:, self.nm - k:] = active
        return self.act(self_state, jnp.asarray(nbr), jnp.asarray(mask), key)
