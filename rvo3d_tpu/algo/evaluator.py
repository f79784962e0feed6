"""Policy evaluation: vectorized, jitted episodes with near-deterministic
actions.

Mirrors post_train.policy_test (reference: train/policy/post_train.py:38-128):
  - std_factor ~ 1e-3 (post_train.py:27)
  - abs_action = acceler_vel * round(a, 2) + cur_vel with acceler_vel = 1.0
    (post_train.py:72-74 — note: eval uses 1.0, training uses the env's 0.5)
  - an episode ends on any collision, at max_ep_len (150), or when all
    drones finish (post_train.py:86)
  - success counts episodes where all drones reached their destinations;
    episode length stats are over successful episodes only (post_train.py:89-104)
  - per-step mean drone speed, averaged per episode (post_train.py:78-81)

Instead of 100 sequential episodes, E lanes each run episodes in lockstep
and records accumulate on device until enough episodes complete.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env import geometry as geo
from rvo3d_tpu.env.env import observe, reset, step
from rvo3d_tpu.env.state import WorldSpec
from rvo3d_tpu.models import ActorCritic


class EvalCarry(NamedTuple):
    env_state: object
    obs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    ep_len: jnp.ndarray     # [E]
    speed_sum: jnp.ndarray  # [E]
    ret0: jnp.ndarray       # [E] drone-0 return (the reference's ep_ret quirk)
    rng: jax.Array


class EvalRecords(NamedTuple):
    """Per (step, lane) episode-completion records."""

    ended: jnp.ndarray      # [T, E] bool
    success: jnp.ndarray    # [T, E] all drones finished
    all_info: jnp.ndarray   # [T, E] all drones arrived (gates EpLen stats)
    ep_len: jnp.ndarray     # [T, E]
    speed: jnp.ndarray      # [T, E] mean speed over the episode
    ret0: jnp.ndarray       # [T, E]


def make_eval_chunk(ac: ActorCritic, world: WorldSpec, p: EnvParams,
                    max_ep_len: int = 150, acceler_vel: float = 1.0,
                    std_factor: float = 1e-3, chunk: int = 160,
                    action_mode: str = "increment"):
    step_b = jax.vmap(functools.partial(step, world, p=p))
    observe_b = jax.vmap(functools.partial(observe, world, p=p))
    # p.noise: per-step injected control noise (drone.py:79-82,163-165
    # semantics — position integrates vel+noise, stored vel stays clean),
    # so eval episodes become genuinely distinct instead of one replicated
    # deterministic trajectory (the ±0.0-std degeneracy, RESULTS.md)
    step_noise_b = jax.vmap(
        lambda s, a, k: step(world, s, a, p, noise_key=k))

    def reset_lanes(env_state, mask):
        fresh = reset(world, p, env_state.pos.dtype)

        def pick(a, b):
            m = mask
            while m.ndim < b.ndim:
                m = m[..., None]
            return jnp.where(m, jnp.broadcast_to(a, b.shape), b)

        return jax.tree_util.tree_map(pick, fresh, env_state)

    def chunk_fn(params, carry):
        return jax.lax.scan(
            functools.partial(_body, params), carry, None, length=chunk)

    def _body(params, c: EvalCarry, _):
        rng, akey, nkey = jax.random.split(c.rng, 3)
        obs_self, obs_nbr, obs_mask = c.obs
        ps = ac.apply(params, akey, obs_self, obs_nbr, obs_mask,
                      std_factor, method=ActorCritic.step)
        a = geo.rnd(ps.action, 2, p.parity_rounding)
        if action_mode == "direct":
            abs_action = a
        else:
            abs_action = acceler_vel * a + c.env_state.vel

        if p.noise:
            nkeys = jax.random.split(nkey, c.env_state.pos.shape[0])
            env_state, out = step_noise_b(c.env_state, abs_action, nkeys)
        else:
            env_state, out = step_b(c.env_state, abs_action)
        speed = jnp.mean(geo.norm3(env_state.vel), axis=-1)       # [E]
        ep_len = c.ep_len + 1
        speed_sum = c.speed_sum + speed
        ret0 = c.ret0 + out.reward[:, 0]

        ended = (jnp.any(out.done, axis=1) | (ep_len == max_ep_len)
                 | jnp.all(out.finish, axis=1))
        rec = EvalRecords(
            ended=ended,
            success=jnp.all(out.finish, axis=1),
            all_info=jnp.all(out.info_arrive, axis=1),
            ep_len=ep_len,
            speed=speed_sum / jnp.maximum(ep_len, 1),
            ret0=ret0,
        )

        env_state = reset_lanes(env_state, ended)
        re_out, env_state = observe_b(env_state)
        nobs = (
            jnp.where(ended[:, None, None], re_out.obs_self, out.obs_self),
            jnp.where(ended[:, None, None, None], re_out.obs_nbr, out.obs_nbr),
            jnp.where(ended[:, None, None], re_out.obs_mask, out.obs_mask),
        )
        new_c = EvalCarry(
            env_state=env_state, obs=nobs,
            ep_len=jnp.where(ended, 0, ep_len),
            speed_sum=jnp.where(ended, 0.0, speed_sum),
            ret0=jnp.where(ended, 0.0, ret0),
            rng=rng,
        )
        return new_c, rec

    return chunk_fn


def evaluate(ac: ActorCritic, params, world: WorldSpec, p: EnvParams,
             key: jax.Array, *, num_episodes: int = 100, num_lanes: int = 16,
             max_ep_len: int = 150, acceler_vel: float = 1.0,
             std_factor: float = 1e-3,
             action_mode: str = "increment",
             max_chunks: int = 32,
             chunk_len: int | None = None) -> Dict[str, float]:
    """Run until >= num_episodes episodes complete; return the reference's
    summary metrics (post_train.py:116-128).

    max_chunks bounds device time (each chunk is chunk_len jitted steps
    across num_lanes lanes); if the bound truncates below num_episodes the
    result carries a "truncated" key and a warning is printed rather than
    silently under-delivering. chunk_len defaults to max_ep_len + 10; CPU
    smoke evals can shrink it to keep per-call latency tolerable."""
    chunk = chunk_len if chunk_len is not None else max_ep_len + 10
    chunk_fn = jax.jit(make_eval_chunk(
        ac, world, p, max_ep_len, acceler_vel, std_factor, chunk,
        action_mode))

    s0 = reset(world, p)
    env_state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_lanes,) + x.shape).copy(), s0)
    out, env_state = jax.vmap(functools.partial(observe, world, p=p))(env_state)
    carry = EvalCarry(
        env_state=env_state,
        obs=(out.obs_self, out.obs_nbr, out.obs_mask),
        ep_len=jnp.zeros((num_lanes,), jnp.int32),
        speed_sum=jnp.zeros((num_lanes,)),
        ret0=jnp.zeros((num_lanes,)),
        rng=key,
    )

    ended_all, success_all, info_all, len_all, speed_all, ret_all = \
        [], [], [], [], [], []
    total = 0
    for _ in range(max_chunks):
        carry, rec = chunk_fn(params, carry)
        e = np.asarray(rec.ended)
        ended_all.append(e)
        success_all.append(np.asarray(rec.success))
        info_all.append(np.asarray(rec.all_info))
        len_all.append(np.asarray(rec.ep_len))
        speed_all.append(np.asarray(rec.speed))
        ret_all.append(np.asarray(rec.ret0))
        total += int(e.sum())
        if total >= num_episodes:
            break

    ended = np.concatenate(ended_all).ravel()
    success = np.concatenate(success_all).ravel()[ended]
    info = np.concatenate(info_all).ravel()[ended]
    lens = np.concatenate(len_all).ravel()[ended]
    speeds = np.concatenate(speed_all).ravel()[ended]
    rets = np.concatenate(ret_all).ravel()[ended]

    # truncate to exactly num_episodes like the sequential loop
    success = success[:num_episodes]
    info = info[:num_episodes]
    lens = lens[:num_episodes]
    speeds = speeds[:num_episodes]
    rets = rets[:num_episodes]
    n = len(success)
    truncated = n < num_episodes
    if truncated:
        print(f"evaluate: WARNING — chunk budget exhausted at {n}/"
              f"{num_episodes} episodes ({max_chunks} chunks x {chunk} "
              f"steps x {num_lanes} lanes); raise max_chunks/num_lanes",
              flush=True)

    ok_lens = lens[info.astype(bool)]
    return {
        **({"truncated": True} if truncated else {}),
        "episodes": int(n),
        "success_rate": float(success.sum() / max(n, 1)),
        "mean_ep_len": float(np.round(ok_lens.mean(), 2)) if len(ok_lens) else 0.0,
        "std_ep_len": float(np.round(ok_lens.std(), 2)) if len(ok_lens) else 0.0,
        "mean_speed": float(np.round(speeds.mean(), 2)) if n else 0.0,
        "std_speed": float(np.round(speeds.std(), 2)) if n else 0.0,
        "mean_ret0": float(np.mean(rets)) if n else 0.0,
    }
