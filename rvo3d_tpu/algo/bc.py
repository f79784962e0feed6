"""Behavior-cloning warm start from the analytic waypoint controller.

PPO from scratch on the reference's reward falls into a "slam the brakes"
attractor: early collisions (−50) teach full deceleration, the tanh action
head saturates at −1, and gradients vanish (RESULTS.md). The standard cure
is to initialize the policy near a sensible controller: roll out the
analytic waypoint controller (utils/heuristic.py), convert its kinematic
commands into the policy's increment space (the trainer applies
abs = acceler·a + vel, multi_ppo.py:202-205, so a* = (cmd − vel)/acceler
clipped to the tanh range), and regress the policy mean onto it. Everything
runs on device; PPO then fine-tunes collision avoidance on top.

This is an extension beyond the reference (which resumed from shipped
checkpoints rather than ever demonstrating from-scratch training,
train_process.py:66 con_train=True).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env.env import observe, reset, reset_where, step
from rvo3d_tpu.env.state import WorldSpec
from rvo3d_tpu.models import ActorCritic
from rvo3d_tpu.utils.heuristic import waypoint_controller


def collect_demos(world: WorldSpec, p: EnvParams, num_envs: int, steps: int,
                  key: jax.Array, cruise_speed: float = 0.6,
                  expert: str = "waypoint", action_mode: str = "increment"):
    """Roll an analytic expert ('waypoint' = pure tracking, 'rvo' = the
    classic cone-dodging controller); returns (obs_self, obs_nbr, obs_mask,
    target) with leading axis [steps*num_envs*N]. In 'direct' mode the
    target IS the expert command; in 'increment' mode it is the
    velocity-anchored increment and the demo steps with the achievable
    command (see module docstring)."""

    observe_b = jax.vmap(functools.partial(observe, world, p=p))
    step_b = jax.vmap(functools.partial(step, world, p=p))
    reset_b = jax.vmap(functools.partial(reset_where, world))

    if expert == "rvo":
        from rvo3d_tpu.env.rvo_policy import rvo_controller

        expert_fn = jax.vmap(lambda st: rvo_controller(st, world, p))
    else:
        expert_fn = functools.partial(waypoint_controller, world=world,
                                      cruise_speed=cruise_speed)

    s0 = reset(world, p)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape).copy(), s0)

    def body(state, _):
        out, state = observe_b(state)
        cmd = expert_fn(state)
        if action_mode == "direct":
            target = jnp.clip(cmd, -0.999, 0.999)
            abs_eff = target
        else:
            target = jnp.clip((cmd - state.vel) / p.acceler, -0.999, 0.999)
            # step with the ACHIEVABLE command (abs = acceler*a + vel can
            # only reach cmd within ±acceler of the velocity vector) so
            # demos are closed-loop consistent with the policy's reach
            abs_eff = p.acceler * target + state.vel
        state, o = step_b(state, abs_eff)
        state = reset_b(state, o.done | o.finish)
        return state, (out.obs_self, out.obs_nbr, out.obs_mask, target)

    _, (os_, on_, om_, tg_) = jax.lax.scan(body, state, None, length=steps)

    # [T, E, N, ...] -> [T*E*N, ...]
    def fl(x):
        return x.reshape((-1,) + x.shape[3:])

    return fl(os_), fl(on_), fl(om_), fl(tg_)


def bc_pretrain(ac: ActorCritic, params, world: WorldSpec, p: EnvParams,
                key: jax.Array, *, num_envs: int = 32, demo_steps: int = 200,
                train_steps: int = 500, batch: int = 4096, lr: float = 1e-3,
                cruise_speed: float = 0.6, expert: str = "waypoint",
                action_mode: str = "increment") -> Tuple[dict, float]:
    """Returns (pretrained params, final BC loss)."""
    k_demo, k_train = jax.random.split(key)
    obs_self, obs_nbr, obs_mask, target = collect_demos(
        world, p, num_envs, demo_steps, k_demo, cruise_speed, expert,
        action_mode)
    n = obs_self.shape[0]

    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(params, idx):
        mu, _, v = ac.apply(params, obs_self[idx], obs_nbr[idx],
                            obs_mask[idx])
        return jnp.mean((mu - target[idx]) ** 2)

    @jax.jit
    def train(params, opt, key):
        def body(carry, _):
            params, opt, key = carry
            key, k = jax.random.split(key)
            idx = jax.random.randint(k, (min(batch, n),), 0, n)
            loss, grads = jax.value_and_grad(loss_fn)(params, idx)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt, key), loss

        (params, opt, _), losses = jax.lax.scan(
            body, (params, opt, key), None, length=train_steps)
        return params, losses[-1]

    params, final_loss = train(params, opt, k_train)
    return params, float(final_loss)
