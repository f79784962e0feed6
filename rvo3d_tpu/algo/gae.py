"""GAE-lambda advantages and discounted returns as a reverse lax.scan.

Replaces the reference's scipy.signal.lfilter trick
(train/policy/multi_ppo.py:21-36) and per-path finish_path slicing
(multi_ppo.py:68-77) with a single masked reverse scan over fixed [T]
buffers: `cut[t]` marks a path boundary AFTER step t (the steps where the
reference calls finish_path(0) for every agent — epoch end, all-arrived, or
terminal; multi_ppo.py:244-281). Collision resets intentionally do NOT cut
(the reference never calls finish_path there — quirk preserved).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gae_advantages(rewards: jnp.ndarray, values: jnp.ndarray,
                   cut: jnp.ndarray, gamma: float, lam: float
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rewards, values: [T, ...]; cut: [T, ...] bool (broadcastable to
    rewards), True when the path ends after step t with bootstrap value 0.
    Returns (advantages, returns), both [T, ...].

    adv[t] = delta[t] + gamma*lam*(1-cut[t])*adv[t+1]
    delta[t] = r[t] + gamma*(1-cut[t])*v[t+1] - v[t]
    ret[t] = r[t] + gamma*(1-cut[t])*ret[t+1]
    """
    cont = jnp.where(cut, 0.0, 1.0)
    cont = jnp.broadcast_to(cont, rewards.shape).astype(rewards.dtype)

    v_next = jnp.concatenate([values[1:], jnp.zeros_like(values[:1])], axis=0)
    deltas = rewards + gamma * cont * v_next - values

    def body(carry, x):
        adv_next, ret_next = carry
        delta_t, r_t, c_t = x
        adv_t = delta_t + gamma * lam * c_t * adv_next
        ret_t = r_t + gamma * c_t * ret_next
        return (adv_t, ret_t), (adv_t, ret_t)

    zero = jnp.zeros_like(rewards[0])
    (_, _), (adv_rev, ret_rev) = jax.lax.scan(
        body, (zero, zero), (deltas[::-1], rewards[::-1], cont[::-1])
    )
    return adv_rev[::-1], ret_rev[::-1]
