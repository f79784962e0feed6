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
                  expert: str = "waypoint", action_mode: str = "increment",
                  explore_std: float = 0.0,
                  expert_margin: float | None = None,
                  behavior_fn=None, expert_slowdown: bool = False,
                  env_noise: bool = False):
    """Roll an analytic expert ('waypoint' = pure tracking, 'rvo' = the
    classic cone-dodging controller); returns (obs_self, obs_nbr, obs_mask,
    target) with leading axis [steps*num_envs*N]. In 'direct' mode the
    target IS the expert command; in 'increment' mode it is the
    velocity-anchored increment and the demo steps with the achievable
    command (see module docstring).

    explore_std > 0 executes a NOISED version of the expert command while
    keeping the CLEAN command as the regression target (DART-style noise
    injection). Without it, the deterministic env + broadcast reset makes
    every lane identical, so the dataset collapses to one ~dozen-state
    trajectory and the clone fails closed-loop the moment it drifts off it
    (measured: BC loss 6e-4 yet 0% eval success). Because the expert is
    re-queried at every visited state, this is DAgger with a noise-widened
    state distribution: each off-path state carries its corrective label.

    expert_margin inflates the RVO expert's cone/endpoint radii (see
    rvo_policy.rvo_velocity) so demonstrations keep slack the clone's
    approximation error can spend.

    behavior_fn(obs_self, obs_nbr, obs_mask) -> action mean, if given,
    DRIVES the rollout (true DAgger: visit the clone's own states) while
    the expert still provides the labels."""
    # default: demo collection uses DART explore_std for state-
    # distribution widening, not env control noise; a --train_noise run
    # still clones on the clean dynamics.
    # env_noise=True instead turns the control-noise channel ON during
    # demos (--bc_env_noise, regardless of --train_noise): every step
    # perturbs the executed motion exactly as the noisy eval does
    # (drone.py:79-82,163-165) while the expert relabels each noise-
    # displaced state — DAgger widening over the TRUE eval noise
    # distribution (round-5, the DART-std-matching item of VERDICT r4 #2).
    import dataclasses

    p = dataclasses.replace(p, noise=bool(env_noise))
    use_env_noise = bool(env_noise)

    observe_b = jax.vmap(functools.partial(observe, world, p=p))
    step_b = jax.vmap(functools.partial(step, world, p=p))
    step_noise_b = jax.vmap(lambda st, a, k: step(world, st, a, p,
                                                  noise_key=k))
    reset_b = jax.vmap(functools.partial(reset_where, world))

    if expert == "rvo":
        from rvo3d_tpu.env.rvo_policy import rvo_controller

        kw = {} if expert_margin is None else {"margin": expert_margin}
        if expert_slowdown:
            kw["slowdown"] = True
        expert_fn = jax.vmap(lambda st: rvo_controller(st, world, p, **kw))
    else:
        expert_fn = functools.partial(waypoint_controller, world=world,
                                      cruise_speed=cruise_speed)

    s0 = reset(world, p)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape).copy(), s0)
    out0, state = observe_b(state)

    def body(carry, k):
        # `out` is the obs the policy would act on at this step: the
        # PREVIOUS step's output obs (action-aware VO blocks), refreshed by
        # observe() only after resets — exactly the rollout/evaluator feed
        # (algo/rollout.py episode lifecycle; reference multi_ppo.py:210,
        # 230-242). Training the clone on observe()-only obs (zero-action
        # VO test) shifts the neighbor-block distribution precisely at the
        # conflict states the dodge depends on.
        state, out = carry
        cmd = expert_fn(state)
        if action_mode == "direct":
            target = jnp.clip(cmd, -0.999, 0.999)
        else:
            target = jnp.clip((cmd - state.vel) / p.acceler, -0.999, 0.999)
        if behavior_fn is not None:
            executed = behavior_fn(out.obs_self, out.obs_nbr, out.obs_mask)
        else:
            executed = target
        if explore_std > 0.0:
            executed = jnp.clip(
                executed + explore_std * jax.random.normal(k, target.shape),
                -1.0, 1.0)
        if action_mode == "direct":
            abs_eff = executed
        else:
            # step with the ACHIEVABLE command (abs = acceler*a + vel can
            # only reach cmd within ±acceler of the velocity vector) so
            # demos are closed-loop consistent with the policy's reach
            abs_eff = p.acceler * executed + state.vel
        if use_env_noise:
            nkeys = jax.random.split(jax.random.fold_in(k, 1),
                                     state.pos.shape[0])
            state, o = step_noise_b(state, abs_eff, nkeys)
        else:
            state, o = step_b(state, abs_eff)
        need = o.done | o.finish
        state = reset_b(state, need)
        re_out, state = observe_b(state)
        any_reset = jnp.any(need, axis=1)
        nxt = o._replace(
            obs_self=jnp.where(any_reset[:, None, None], re_out.obs_self,
                               o.obs_self),
            obs_nbr=jnp.where(any_reset[:, None, None, None], re_out.obs_nbr,
                              o.obs_nbr),
            obs_mask=jnp.where(any_reset[:, None, None], re_out.obs_mask,
                               o.obs_mask),
        )
        return (state, nxt), (out.obs_self, out.obs_nbr, out.obs_mask, target)

    _, (os_, on_, om_, tg_) = jax.lax.scan(
        body, (state, out0), jax.random.split(key, steps))

    # [T, E, N, ...] -> [T*E*N, ...]
    def fl(x):
        return x.reshape((-1,) + x.shape[3:])

    return fl(os_), fl(on_), fl(om_), fl(tg_)


def bc_pretrain(ac: ActorCritic, params, world: WorldSpec, p: EnvParams,
                key: jax.Array, *, num_envs: int = 32, demo_steps: int = 200,
                train_steps: int = 500, batch: int = 4096, lr: float = 1e-3,
                cruise_speed: float = 0.6, expert: str = "waypoint",
                action_mode: str = "increment", explore_std: float = 0.0,
                expert_margin: float | None = None,
                dagger_rounds: int = 0, conflict_weight: float = 1.0,
                expert_slowdown: bool = False, env_noise: bool = False,
                on_round=None) -> Tuple[dict, float]:
    """Behavior cloning with optional DAgger iterations.

    Round 0 rolls the (noised) expert; each DAgger round then rolls the
    CURRENT clone's mean action (+ the same exploration noise), relabels
    every visited state with the expert, aggregates the dataset, and
    refits. This closes the covariate-shift gap that plain BC leaves:
    the clone trains exactly on the states its own errors reach.
    Returns (pretrained params, final BC loss on the aggregate set).

    The aggregate dataset lives in a FIXED-capacity buffer (capacity =
    (dagger_rounds+1) x one round's yield) with a traced valid-count, so
    every round reuses one compiled train fn — the naive concatenate-
    and-refit version recompiles per round (new leading dim), which costs
    minutes per round on the remote-compile TPU path.

    `world` may be a SEQUENCE of WorldSpecs (multi-scenario training):
    every round then collects demos from each scenario into ONE aggregate
    set and fits jointly. Round-4 measurement (runs/w32_multi): fitting
    scenarios SEQUENTIALLY (full BC on A, then full BC on B) leaves a
    clone that PPO drifts between populations — per-scenario success
    oscillated 0/100 % and never held both; a mixed set removes the
    ordering bias."""
    # NB WorldSpec is itself a NamedTuple — test the concrete type, not
    # tuple-ness, or the spec's leaves get unpacked as "worlds"
    worlds = [world] if isinstance(world, WorldSpec) else list(world)
    tx = optax.adam(lr)
    round_n = demo_steps * num_envs * p.num_drones * len(worlds)
    cap = round_n * (dagger_rounds + 1)

    def loss_fn(params, data, idx):
        obs_self, obs_nbr, obs_mask, target = data
        mask = obs_mask[idx]
        mu, _, v = ac.apply(params, obs_self[idx], obs_nbr[idx], mask)
        err = (mu - target[idx]) ** 2
        if conflict_weight != 1.0:
            # round-4 (w3 diagnosis): the det clone's per-component RMS
            # error (~0.055 at loss 3e-3) is the same size as the expert's
            # early dodge labels at conflict states, so the dodge drowns in
            # approximation error and the mean policy flies straight into
            # the crossing (runs/w3_r3, scripts/w3_diag.py). Upweight
            # samples with any flagged VO neighbor: cruise states are easy
            # and abundant; conflict states carry the behavior that
            # decides episodes.
            w = 1.0 + (conflict_weight - 1.0) * jnp.any(mask, -1)
            return jnp.sum(w[:, None] * err) / (3.0 * jnp.sum(w))
        return jnp.mean(err)

    @functools.partial(jax.jit, static_argnames="steps")
    def fit(params, data, n_valid, key, steps):
        opt = tx.init(params)

        def body(carry, _):
            params, opt, key = carry
            key, k = jax.random.split(key)
            idx = jax.random.randint(k, (min(batch, cap),), 0, n_valid)
            loss, grads = jax.value_and_grad(loss_fn)(params, data, idx)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt, key), loss

        (params, opt, _), losses = jax.lax.scan(
            body, (params, opt, key), None, length=steps)
        return params, losses[-1]

    chunk_n = demo_steps * num_envs * p.num_drones   # one world's yield

    @jax.jit
    def insert(data, new, n_valid):
        return (tuple(jax.lax.dynamic_update_slice_in_dim(d, x, n_valid, 0)
                      for d, x in zip(data, new)), n_valid + chunk_n)

    def collect_round(data, n_valid, key, behavior_fn=None):
        for w in worlds:
            key, k_demo = jax.random.split(key)
            new = collect_demos(w, p, num_envs, demo_steps, k_demo,
                                cruise_speed, expert, action_mode,
                                explore_std, expert_margin,
                                behavior_fn=behavior_fn,
                                expert_slowdown=expert_slowdown,
                                env_noise=env_noise)
            if data is None:
                data = tuple(jnp.zeros((cap,) + x.shape[1:], x.dtype)
                             for x in new)
                n_valid = jnp.int32(0)
            data, n_valid = insert(data, new, n_valid)
        return data, n_valid

    k_round, k_train, key = jax.random.split(key, 3)
    data, n_valid = collect_round(None, None, k_round)
    params, final_loss = fit(params, data, n_valid, k_train, train_steps)
    if on_round is not None:
        on_round(0, params, float(final_loss))

    for r in range(dagger_rounds):
        k_round, k_train, key = jax.random.split(key, 3)
        frozen = params

        def behavior_fn(obs_self, obs_nbr, obs_mask):
            mu, _, _ = ac.apply(frozen, obs_self, obs_nbr, obs_mask)
            return mu

        data, n_valid = collect_round(data, n_valid, k_round, behavior_fn)
        params, final_loss = fit(params, data, n_valid, k_train, train_steps)
        if on_round is not None:
            on_round(r + 1, params, float(final_loss))

    return params, float(final_loss)
