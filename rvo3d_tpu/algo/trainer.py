"""Trainer: one jitted epoch = rollout -> GAE -> PPO update, plus the host
loop (checkpointing, metrics, eval scheduling).

Replaces multi_ppo.training_loop's Python hot loop (reference:
train/policy/multi_ppo.py:166-339) with a single on-device program per
epoch; the only host work is logging and checkpoint IO.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rvo3d_tpu.config import Config
from rvo3d_tpu.algo.gae import gae_advantages
from rvo3d_tpu.algo.ppo import (AgentData, PPOState, UpdateMetrics,
                                make_optimizers, ppo_update)
from rvo3d_tpu.algo.rollout import (EpisodeStats, RolloutCarry,
                                    init_rollout_carry, rollout_epoch)
from rvo3d_tpu.env.state import WorldSpec
from rvo3d_tpu.models import ActorCritic


class EpochOutput(NamedTuple):
    ppo_state: PPOState
    carry: RolloutCarry
    stats: EpisodeStats
    update_metrics: UpdateMetrics
    mean_reward: jnp.ndarray


def make_train_epoch(ac: ActorCritic, world: WorldSpec, cfg: Config,
                     pi_tx, vf_tx, lane_worlds=None):
    env_p = cfg.env
    tr = cfg.train

    def train_epoch(ppo_state: PPOState, carry: RolloutCarry,
                    key: jax.Array) -> EpochOutput:
        carry, batch = rollout_epoch(
            ac, world, env_p, tr, ppo_state.params, carry,
            lane_worlds=lane_worlds,
        )
        cut_full = batch.cut[:, :, None]                    # [T, E, 1]
        adv, ret = gae_advantages(batch.rew, batch.val, cut_full,
                                  tr.gamma, tr.lam)
        data = AgentData(
            obs_self=batch.obs_self, obs_nbr=batch.obs_nbr,
            obs_mask=batch.obs_mask, act=batch.act,
            adv=adv, ret=ret, logp=batch.logp, val=batch.val,
        )
        ppo_state, upd = ppo_update(ac, tr, pi_tx, vf_tx, ppo_state, data, key)

        stats = carry.stats
        carry = carry._replace(stats=EpisodeStats.zero(stats.count.shape[0]))
        return EpochOutput(
            ppo_state=ppo_state, carry=carry, stats=stats,
            update_metrics=upd, mean_reward=jnp.mean(batch.rew),
        )

    return train_epoch


def metrics_finite(metrics: Dict[str, Any]) -> bool:
    """True iff the epoch's learner-health scalars are all finite.

    The reference has no failure detection: its unguarded reward can go
    inf (ir_gym.py:77 divides by a zero desired velocity) and silently
    NaN-poison the optimizer state for the rest of the run. Here the
    trainer watches mean step reward and per-agent losses each epoch."""
    vals = [metrics["mean_step_reward"]]
    vals += (list(metrics["pi_loss"]) + list(metrics["v_loss"])
             + list(metrics["kl"]))
    return bool(np.all(np.isfinite(np.asarray(vals, dtype=np.float64))))


class Trainer:
    """End-to-end training driver (reference: train/train_process.py)."""

    def __init__(self, cfg: Config, world: WorldSpec,
                 mesh: Optional[Any] = None, lane_worlds: Any = None):
        """lane_worlds: optional per-lane WorldSpec (leaves
        [num_envs, ...], see worlds/multi.py) for multi-scenario training;
        `world` then supplies static shapes (any of the stacked specs)."""
        self.cfg = cfg
        self.world = world
        self.ac = ActorCritic(cfg.model)
        self.mesh = mesh
        self.lane_worlds = lane_worlds

        key = jax.random.PRNGKey(cfg.train.seed)
        self.key, init_key = jax.random.split(key)
        n = world.num_drones
        nm = cfg.env.neighbor_num
        dummy_self = jnp.zeros((1, cfg.model.state_dim))
        dummy_nbr = jnp.zeros((1, nm, cfg.model.rnn_input_dim))
        dummy_mask = jnp.zeros((1, nm), bool)
        params = self.ac.init(init_key, dummy_self, dummy_nbr, dummy_mask)

        self.pi_tx, self.vf_tx = make_optimizers(cfg.train, params)
        self.ppo_state = PPOState(
            params=params,
            pi_opt=self.pi_tx.init(params),
            vf_opt=self.vf_tx.init(params),
        )

        self.key, carry_key = jax.random.split(self.key)
        self.carry = init_rollout_carry(
            world, cfg.env, cfg.train.num_envs, carry_key,
            lane_worlds=lane_worlds,
        )
        self._train_epoch = jax.jit(
            make_train_epoch(self.ac, world, cfg, self.pi_tx, self.vf_tx,
                             lane_worlds=lane_worlds)
        )

    def run_epoch(self) -> Dict[str, Any]:
        self.key, k = jax.random.split(self.key)
        t0 = time.time()
        out = self._train_epoch(self.ppo_state, self.carry, k)
        out.mean_reward.block_until_ready()
        dt = time.time() - t0
        self.ppo_state = out.ppo_state
        self.carry = out.carry

        st = out.stats
        count = np.asarray(st.count)
        mean_ret = np.where(count > 0, np.asarray(st.ret_sum) / np.maximum(count, 1), 0.0)
        metrics = {
            "epoch_time_s": dt,
            "env_steps": self.cfg.train.steps_per_epoch * self.cfg.train.num_envs,
            "steps_per_sec": self.cfg.train.steps_per_epoch
            * self.cfg.train.num_envs / dt,
            "mean_step_reward": float(out.mean_reward),
            "episodes": count.tolist(),
            "ep_ret_mean": mean_ret.tolist(),
            "ep_ret_min": np.where(count > 0, np.asarray(st.ret_min), 0.0).tolist(),
            "ep_ret_max": np.where(count > 0, np.asarray(st.ret_max), 0.0).tolist(),
            "success_episodes": np.asarray(st.finish_count).tolist(),
            "collision_episodes": np.asarray(st.collision_count).tolist(),
            "pi_loss": np.asarray(out.update_metrics.pi_loss).tolist(),
            "v_loss": np.asarray(out.update_metrics.v_loss).tolist(),
            "kl": np.asarray(out.update_metrics.kl).tolist(),
            "pi_iters": np.asarray(out.update_metrics.pi_iters).tolist(),
        }
        # learner-health alarm: an agent whose FIRST-iteration KL already
        # exceeds target_kl (stale rollout logp after earlier agents moved
        # the shared encoder) silently loses its entire policy update —
        # observed live in round 1 (pi_iters: [50, 0]). Surface it.
        stalled = int(np.sum(np.asarray(out.update_metrics.pi_iters) == 0))
        if stalled:
            metrics["pi_stalled_agents"] = stalled
        return metrics

    def train(self, epochs: Optional[int] = None, log_fn=print,
              checkpoint_fn=None, eval_fn=None,
              eval_every: Optional[int] = None) -> None:
        """eval_fn(epoch, ppo_state) runs every eval_every epochs — the
        reference's mid-training evaluation (multi_ppo.py:283-292 runs it
        in a thread on a second env; here it's a jitted function sharing
        the device, so it runs inline).

        If eval_fn accepts a `saved` keyword, it receives whether that
        epoch's state was persisted to disk — best-checkpoint tracking must
        only record restorable epochs (ADVICE r4: --eval_every cadence
        epochs that are not save_freq-aligned have no checkpoint, so a
        best_checkpoint.json hint pointing at one fails to restore)."""
        import inspect

        takes_saved = eval_fn is not None and (
            "saved" in inspect.signature(eval_fn).parameters)

        def run_eval(epoch, state, saved):
            if takes_saved:
                eval_fn(epoch, state, saved=saved)
            else:
                eval_fn(epoch, state)

        epochs = epochs if epochs is not None else self.cfg.train.train_epoch
        last_good = (-1, self.ppo_state, self.carry)
        for epoch in range(epochs + 1):
            metrics = self.run_epoch()
            metrics["epoch"] = epoch
            if not metrics_finite(metrics):
                # Failure detection (no reference analogue — its NaN runs
                # continue silently): roll back to the last finite epoch,
                # persist a rescue checkpoint UNDER THAT EPOCH's index (it
                # holds that epoch's state, not the failed one's), halt.
                metrics["non_finite_halt"] = True
                log_fn(metrics)
                good_epoch, self.ppo_state, self.carry = last_good
                if checkpoint_fn:
                    checkpoint_fn(max(good_epoch, 0), self.ppo_state)
                log_fn({
                    "epoch": epoch, "halted": "non-finite metrics",
                    "restored_to_epoch": good_epoch,
                    "rescue_checkpoint_saved": checkpoint_fn is not None,
                })
                # score the rescued state so no halt is ever scoreless
                # (the rescue checkpoint was just persisted under its index)
                if eval_fn:
                    run_eval(max(good_epoch, 0), self.ppo_state,
                             saved=checkpoint_fn is not None)
                return
            last_good = (epoch, self.ppo_state, self.carry)
            log_fn(metrics)
            saved = checkpoint_fn and (
                epoch % self.cfg.train.save_freq == 0 or epoch == epochs
            )
            if saved:
                checkpoint_fn(epoch, self.ppo_state)
            # every persisted checkpoint gets an eval line (round-2 lesson:
            # w2_curr4 died with 5 checkpoints on disk and no score), plus
            # the explicit eval_every cadence.
            # epoch 0 included: it IS checkpointed (0 % save_freq == 0), so
            # excluding it would leave one persisted checkpoint scoreless if
            # a run dies inside the first save_freq epochs (ADVICE r3) — and
            # its eval doubles as the warm-start (e.g. BC clone) baseline.
            if eval_fn and (
                saved or (eval_every and (epoch % eval_every == 0
                                          or epoch == epochs))
            ):
                run_eval(epoch, self.ppo_state, saved=bool(saved))
