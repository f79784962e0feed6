"""On-device rollout: one epoch of experience as a single lax.scan.

Mirrors the hot loop of multi_ppo.training_loop (reference:
train/policy/multi_ppo.py:183-281), vectorized over E env instances and N
agents:

  per step t:
    a, v, logp = policy(obs)           (multi_ppo.py:196; a rounded to 2dp,
                                        logp kept for the UNROUNDED sample —
                                        quirk preserved, :196-198)
    abs = round(acceler*a + vel, 2)    (:202-205)
    env.step(abs)
    store (obs, a, r, v, logp)
    lifecycle:
      collision  -> per-drone reset, no GAE cut      (:230-242)
      epoch end | all arrived -> full reset, cut     (:244-264)
      terminal (any finished / over length) -> per-drone reset, cut (:266-281)
    obs <- recomputed after any reset               (:242, :249-251, :281)

The cut flags feed gae_advantages; episode-return/indicator statistics are
accumulated on device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams, TrainConfig
from rvo3d_tpu.env import geometry as geo
from rvo3d_tpu.env.env import observe, reset_where, step
from rvo3d_tpu.env.state import DroneState, StepOutput, WorldSpec
from rvo3d_tpu.models import ActorCritic


class EpisodeStats(NamedTuple):
    """Per-agent completed-episode aggregates, all [N]."""

    count: jnp.ndarray
    ret_sum: jnp.ndarray
    ret_min: jnp.ndarray
    ret_max: jnp.ndarray
    len_sum: jnp.ndarray
    finish_count: jnp.ndarray      # episodes ended by destination arrival
    collision_count: jnp.ndarray   # episodes ended by collision

    @staticmethod
    def zero(n: int) -> "EpisodeStats":
        z = jnp.zeros((n,), jnp.float32)
        return EpisodeStats(z, z, jnp.full((n,), jnp.inf),
                            jnp.full((n,), -jnp.inf), z, z, z)

    def record(self, mask: jnp.ndarray, ep_ret: jnp.ndarray,
               ep_len: jnp.ndarray, finished: jnp.ndarray,
               collided: jnp.ndarray) -> "EpisodeStats":
        """mask/ep_ret/ep_len: [E, N]; reduce over E."""
        m = mask.astype(jnp.float32)
        return EpisodeStats(
            count=self.count + m.sum(0),
            ret_sum=self.ret_sum + (ep_ret * m).sum(0),
            ret_min=jnp.minimum(
                self.ret_min, jnp.where(mask, ep_ret, jnp.inf).min(0)),
            ret_max=jnp.maximum(
                self.ret_max, jnp.where(mask, ep_ret, -jnp.inf).max(0)),
            len_sum=self.len_sum + (ep_len.astype(jnp.float32) * m).sum(0),
            finish_count=self.finish_count + (mask & finished).sum(0),
            collision_count=self.collision_count + (mask & collided).sum(0),
        )


class RolloutCarry(NamedTuple):
    env_state: DroneState          # [E, N, ...]
    obs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # self, nbr, mask
    ep_len: jnp.ndarray            # [E, N] int32
    ep_ret: jnp.ndarray            # [E, N]
    rng: jax.Array
    stats: EpisodeStats


class RolloutBatch(NamedTuple):
    """Stored experience, leaves [T, E, N, ...]."""

    obs_self: jnp.ndarray
    obs_nbr: jnp.ndarray
    obs_mask: jnp.ndarray
    act: jnp.ndarray
    rew: jnp.ndarray
    val: jnp.ndarray
    logp: jnp.ndarray
    cut: jnp.ndarray               # [T, E] path boundary after step t


def init_rollout_carry(world: WorldSpec, p: EnvParams, num_envs: int,
                       rng: jax.Array, dtype=jnp.float32,
                       lane_worlds: WorldSpec | None = None) -> RolloutCarry:
    from rvo3d_tpu.env.env import reset

    if lane_worlds is None:
        s = reset(world, p, dtype)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape).copy(), s
        )
        out, state = jax.vmap(lambda st: observe(world, st, p))(state)
    else:
        state = jax.vmap(lambda w: reset(w, p, dtype))(lane_worlds)
        out, state = jax.vmap(
            lambda w, st: observe(w, st, p))(lane_worlds, state)
    n = world.num_drones
    return RolloutCarry(
        env_state=state,
        obs=(out.obs_self, out.obs_nbr, out.obs_mask),
        ep_len=jnp.zeros((num_envs, n), jnp.int32),
        ep_ret=jnp.zeros((num_envs, n), dtype),
        rng=rng,
        stats=EpisodeStats.zero(n),
    )


def rollout_epoch(ac: ActorCritic, world: WorldSpec, env_p: EnvParams,
                  cfg: TrainConfig, params, carry: RolloutCarry,
                  lane_worlds: WorldSpec | None = None
                  ) -> Tuple[RolloutCarry, RolloutBatch]:
    """Collect cfg.steps_per_epoch steps across all E env lanes.

    lane_worlds: optional per-lane WorldSpec (leaves [E, ...]) for
    multi-scenario batches (worlds/multi.py); `world` is then only used for
    static shape info."""

    if lane_worlds is None:
        step_b = jax.vmap(functools.partial(step, world, p=env_p))
        step_noise_b = jax.vmap(
            lambda s, a, k: step(world, s, a, env_p, noise_key=k))
        observe_b = jax.vmap(functools.partial(observe, world, p=env_p))
        reset_where_b = jax.vmap(functools.partial(reset_where, world))
    else:
        lw = lane_worlds
        step_b = lambda s, a: jax.vmap(
            lambda w, st, ac_: step(w, st, ac_, env_p))(lw, s, a)
        step_noise_b = lambda s, a, k: jax.vmap(
            lambda w, st, ac_, kk: step(w, st, ac_, env_p, noise_key=kk)
        )(lw, s, a, k)
        observe_b = lambda s: jax.vmap(
            lambda w, st: observe(w, st, env_p))(lw, s)
        reset_where_b = lambda s, m: jax.vmap(
            lambda w, st, mm: reset_where(w, st, mm))(lw, s, m)

    T = cfg.steps_per_epoch

    def scan_body(c: RolloutCarry, t):
        rng, akey = jax.random.split(c.rng)
        obs_self, obs_nbr, obs_mask = c.obs

        ps = ac.apply(params, akey, obs_self, obs_nbr, obs_mask,
                      method=ActorCritic.step)
        a_inc = geo.rnd(ps.action, 2, env_p.parity_rounding)
        if getattr(cfg, "action_mode", "increment") == "direct":
            abs_action = a_inc
        else:
            abs_action = geo.rnd(
                env_p.acceler * a_inc + c.env_state.vel, 2,
                env_p.parity_rounding,
            )

        if env_p.noise:
            rng, nk = jax.random.split(rng)
            nkeys = jax.random.split(nk, abs_action.shape[0])
            env_state, out = step_noise_b(c.env_state, abs_action, nkeys)
        else:
            env_state, out = step_b(c.env_state, abs_action)

        ep_len = c.ep_len + 1
        ep_ret = c.ep_ret + out.reward

        # ---- lifecycle flags (multi_ppo.py:226-229) ----
        epoch_ended = t == T - 1
        arrive_all = jnp.all(out.finish, axis=1)                 # [E]
        terminal = jnp.any(out.finish, axis=1) | (
            jnp.max(ep_len, axis=1) > cfg.max_ep_len
        )

        # ---- collision branch: per-drone resets, no cut (:230-242) ----
        col_mask = out.done                                      # [E, N]
        stats = c.stats.record(
            col_mask, ep_ret, ep_len,
            finished=jnp.zeros_like(col_mask), collided=col_mask,
        )
        env_state = reset_where_b(env_state, col_mask)
        ep_ret = jnp.where(col_mask, 0.0, ep_ret)
        ep_len = jnp.where(col_mask, 0, ep_len)

        # ---- full-reset branch (:244-264) ----
        full = epoch_ended | arrive_all                          # [E]
        stats = stats.record(
            full[:, None] & arrive_all[:, None] & jnp.ones_like(col_mask),
            ep_ret, ep_len,
            finished=jnp.broadcast_to(arrive_all[:, None], col_mask.shape),
            collided=jnp.zeros_like(col_mask),
        )
        env_state = reset_where_b(
            env_state, jnp.broadcast_to(full[:, None], col_mask.shape)
        )
        ep_ret = jnp.where(full[:, None], 0.0, ep_ret)
        ep_len = jnp.where(full[:, None], 0, ep_len)

        # ---- terminal branch (elif — only where not full) (:266-281) ----
        term = (~full) & terminal                                # [E]
        term_mask = term[:, None] & (
            out.finish | (ep_len > cfg.max_ep_len)
        )
        stats = stats.record(
            term_mask, ep_ret, ep_len,
            finished=out.finish, collided=jnp.zeros_like(term_mask),
        )
        env_state = reset_where_b(env_state, term_mask)
        ep_ret = jnp.where(term_mask, 0.0, ep_ret)
        ep_len = jnp.where(term_mask, 0, ep_len)

        cut = epoch_ended | arrive_all | terminal                # [E]

        # ---- next obs: recompute for lanes that reset anything ----
        any_reset = jnp.any(col_mask, axis=1) | full | term      # [E]
        re_out, env_state = observe_b(env_state)
        nobs_self = jnp.where(any_reset[:, None, None], re_out.obs_self,
                              out.obs_self)
        nobs_nbr = jnp.where(any_reset[:, None, None, None], re_out.obs_nbr,
                             out.obs_nbr)
        nobs_mask = jnp.where(any_reset[:, None, None], re_out.obs_mask,
                              out.obs_mask)

        new_carry = RolloutCarry(
            env_state=env_state,
            obs=(nobs_self, nobs_nbr, nobs_mask),
            ep_len=ep_len,
            ep_ret=ep_ret,
            rng=rng,
            stats=stats,
        )
        stored = RolloutBatch(
            obs_self=obs_self, obs_nbr=obs_nbr, obs_mask=obs_mask,
            act=a_inc, rew=out.reward, val=ps.value, logp=ps.logp,
            cut=jnp.broadcast_to(cut, (out.reward.shape[0],)),
        )
        return new_carry, stored

    carry, batch = jax.lax.scan(scan_body, carry, jnp.arange(T))
    return carry, batch
