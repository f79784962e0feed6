"""PPO learner: clipped surrogate + KL early stop + per-agent update
schedule, fully on-device.

Mirrors multi_ppo.update (reference: train/policy/multi_ppo.py:341-404):
  - agents updated sequentially in a shuffled order, capped at
    max_update_num (multi_ppo.py:343-352)
  - per agent: up to train_pi_iters policy steps with KL early stop
    *checked before applying* (multi_ppo.py:355-368), then train_v_iters
    value steps (multi_ppo.py:371-376)
  - two Adam optimizers with separate learning rates; the shared encoder
    belongs to BOTH (the torch module sharing quirk, policy_rnn_ac.py:46-54):
    pi-Adam updates {encoder, actor, log_std}, vf-Adam {encoder, critic},
    each with its own moments
  - gradient clip by global norm 2.0 on the policy step (multi_ppo.py:367).
    Deliberate deviation: the reference's clip-norm also sums stale critic
    grads left from the previous value phase (torch zero_grad is
    per-optimizer); we clip only the live policy gradients.

The data-dependent iteration count lives in a lax.while_loop — no host
round-trips inside the epoch.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from rvo3d_tpu.config import TrainConfig
from rvo3d_tpu.models import ActorCritic


class PPOState(NamedTuple):
    params: Any
    pi_opt: Any
    vf_opt: Any


class AgentData(NamedTuple):
    """Flattened per-agent batch: leaves [B, ...]."""

    obs_self: jnp.ndarray
    obs_nbr: jnp.ndarray
    obs_mask: jnp.ndarray
    act: jnp.ndarray
    adv: jnp.ndarray
    ret: jnp.ndarray
    logp: jnp.ndarray
    val: jnp.ndarray  # rollout value estimate (for optional value clipping)


class UpdateMetrics(NamedTuple):
    pi_loss: jnp.ndarray   # [n_upd] first-iter policy loss per updated agent
    v_loss: jnp.ndarray    # [n_upd] final value loss
    kl: jnp.ndarray        # [n_upd] kl at stop (or last iter)
    pi_iters: jnp.ndarray  # [n_upd] applied policy steps before early stop


def _mask_tree(params, predicate):
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict({k: predicate(k) for k in flat})


def _masked_only(inner, mask):
    """optax.masked that ZEROES the non-masked updates instead of passing
    raw gradients through (optax.masked's passthrough is harmless only
    when the unmasked grads are structurally zero — true for the default
    masks, where each loss has no dependence on the other head, but NOT
    for vf_encoder=False/freeze_encoder, where the excluded encoder has
    nonzero grads that would otherwise leak through at step size 1)."""
    inv_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv_mask),
    )


def make_optimizers(cfg: TrainConfig, params):
    """pi optimizer over {encoder, actor, log_std}; vf over
    {encoder, critic}; torch-default Adam hyperparams.

    cfg.vf_encoder=False drops the encoder from the vf mask (critic-head-
    only value updates); cfg.freeze_encoder drops it from BOTH (see
    TrainConfig — the round-5 fine-tune-collapse experiments)."""
    def _is_enc(k):
        return ("critic" not in k) and ("actor" not in k) and (
            "log_std" not in k)

    pi_mask = _mask_tree(
        params, lambda k: ("critic" not in k)
        and not (cfg.freeze_encoder and _is_enc(k)))
    vf_mask = _mask_tree(
        params, lambda k: ("actor" not in k) and ("log_std" not in k)
        and not ((cfg.freeze_encoder or not cfg.vf_encoder) and _is_enc(k))
    )
    # Default masks: each loss is structurally independent of the excluded
    # head (pi_loss has no critic term, v_loss no actor/log_std term), so
    # plain optax.masked's grad passthrough adds exact zeros and the
    # optimizer STATE STRUCTURE stays checkpoint-compatible with every
    # earlier run. The encoder-excluding flags break that independence —
    # only then wrap with the zeroing chain (those runs start fresh
    # optimizers via --resume_params_only anyway).
    wrap = (_masked_only if (cfg.freeze_encoder or not cfg.vf_encoder)
            else optax.masked)
    pi_tx = wrap(
        optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adam(cfg.pi_lr, b1=0.9, b2=0.999, eps=1e-8),
        ),
        pi_mask,
    )
    vf_tx = wrap(optax.adam(cfg.vf_lr, b1=0.9, b2=0.999, eps=1e-8),
                 vf_mask)
    return pi_tx, vf_tx


def _select(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def pi_loss_fn(ac: ActorCritic, params, batch: AgentData, clip_ratio: float,
               adv_norm: bool = False, ent_coef: float = 0.0):
    logp = ac.apply(params, batch.obs_self, batch.obs_nbr, batch.obs_mask,
                    batch.act, method=ActorCritic.logp)
    adv = batch.adv
    if adv_norm:
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
    # clamp the log-ratio: exp of an unbounded difference overflows to inf
    # and poisons the update (values past e^20 are pathological regardless)
    ratio = jnp.exp(jnp.clip(logp - batch.logp, -20.0, 20.0))
    clip_adv = jnp.clip(ratio, 1 - clip_ratio, 1 + clip_ratio) * adv
    loss = -jnp.mean(jnp.minimum(ratio * adv, clip_adv))
    if ent_coef:
        ent = ac.apply(params, method=ActorCritic.entropy)
        loss = loss - ent_coef * jnp.mean(ent)
    kl = jnp.mean(batch.logp - logp)
    clipped = (ratio > 1 + clip_ratio) | (ratio < 1 - clip_ratio)
    return loss, (kl, jnp.mean(clipped.astype(jnp.float32)))


def v_loss_fn(ac: ActorCritic, params, batch: AgentData,
              value_clip: float = 0.0):
    v = ac.apply(params, batch.obs_self, batch.obs_nbr, batch.obs_mask,
                 method=ActorCritic.value)
    if value_clip > 0.0:
        # PPO2-style clipped value loss: the new prediction may not move
        # more than value_clip from the rollout estimate per update phase
        # (tames the raw-MSE v_loss blowups the reference exhibits).
        v_clip = batch.val + jnp.clip(v - batch.val, -value_clip, value_clip)
        return jnp.mean(jnp.maximum((v - batch.ret) ** 2,
                                    (v_clip - batch.ret) ** 2))
    return jnp.mean((v - batch.ret) ** 2)


def update_one_agent(ac: ActorCritic, cfg: TrainConfig, pi_tx, vf_tx,
                     state: PPOState, batch: AgentData, key=None):
    """The per-agent inner loops (multi_ppo.py:355-376).

    cfg.minibatch > 0: each iteration optimizes a fresh random contiguous
    dynamic-slice window of the flattened batch instead of all [B] samples
    (see TrainConfig.minibatch — the E-scaling fast path)."""
    pi_grad = jax.value_and_grad(
        functools.partial(pi_loss_fn, ac), has_aux=True)
    v_grad = jax.value_and_grad(functools.partial(v_loss_fn, ac))

    if cfg.fresh_logp:
        batch = batch._replace(logp=ac.apply(
            state.params, batch.obs_self, batch.obs_nbr, batch.obs_mask,
            batch.act, method=ActorCritic.logp))

    B = batch.act.shape[0]
    mb = cfg.minibatch if 0 < cfg.minibatch < B else 0
    if mb and key is None:
        key = jax.random.PRNGKey(cfg.seed)

    def sub_batch(i, salt):
        if not mb:
            return batch
        off = jax.random.randint(
            jax.random.fold_in(jax.random.fold_in(key, salt), i),
            (), 0, B - mb + 1)
        return AgentData(*[
            jax.lax.dynamic_slice_in_dim(x, off, mb, 0) for x in batch])

    def pi_cond(c):
        i, _, _, stopped, _, _, _ = c
        return (i < cfg.train_pi_iters) & (~stopped)

    def pi_body(c):
        i, params, opt, _, first_loss, _, iters = c
        (loss, (kl, _)), grads = pi_grad(params, sub_batch(i, 0),
                                         cfg.clip_ratio,
                                         cfg.adv_norm, cfg.ent_coef)
        stop = kl > cfg.target_kl
        updates, new_opt = pi_tx.update(grads, opt, params)
        new_params = optax.apply_updates(params, updates)
        params = _select(stop, params, new_params)
        opt = _select(stop, opt, new_opt)
        first_loss = jnp.where(i == 0, loss, first_loss)
        iters = iters + jnp.where(stop, 0, 1)
        return (i + 1, params, opt, stop, first_loss, kl, iters)

    init = (jnp.int32(0), state.params, state.pi_opt, jnp.bool_(False),
            jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0))
    _, params, pi_opt, _, first_loss, kl, iters = jax.lax.while_loop(
        pi_cond, pi_body, init
    )

    def v_body(i, c):
        params, opt, _ = c
        loss, grads = v_grad(params, sub_batch(i, 1), cfg.value_clip)
        updates, new_opt = vf_tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), new_opt, loss)

    params, vf_opt, v_loss = jax.lax.fori_loop(
        0, cfg.train_v_iters, v_body,
        (params, state.vf_opt, jnp.float32(0.0)),
    )
    return PPOState(params, pi_opt, vf_opt), (first_loss, v_loss, kl, iters)


def ppo_update(ac: ActorCritic, cfg: TrainConfig, pi_tx, vf_tx,
               state: PPOState, data, key) -> Tuple[PPOState, UpdateMetrics]:
    """data: AgentData with leaves [T, E, N, ...]. Shuffled agent order,
    first max_update_num agents updated sequentially (shared Adam moments
    carry across agents, like the single torch optimizer instances).

    cfg.batched_update flattens all agents into ONE joint batch and runs a
    single policy/value phase — same losses, ~N x fewer GRU passes at N x
    the batch size (MXU-friendly fast path)."""
    if cfg.batched_update:
        batch = AgentData(
            *[x.reshape((-1,) + x.shape[3:]) for x in data])
        state, (pl, vl, kl, it) = update_one_agent(
            ac, cfg, pi_tx, vf_tx, state, batch, key=key)
        return state, UpdateMetrics(
            pi_loss=pl[None], v_loss=vl[None], kl=kl[None],
            pi_iters=it[None])

    n_agents = data.act.shape[2]
    n_upd = min(cfg.max_update_num, n_agents)
    perm = jax.random.permutation(key, n_agents)

    def flatten_agent(x, r):
        # one-hot broadcast-sum, not jnp.take: the axon TPU backend
        # miscompiles small-gather lowerings under fusion (see
        # env/state.py:_wp_select); 0/1 weights keep the values exact.
        dt = jnp.float32 if x.dtype == jnp.bool_ else x.dtype
        oh = jax.nn.one_hot(r, x.shape[2], dtype=dt)
        oh = oh.reshape((1, 1, x.shape[2]) + (1,) * (x.ndim - 3))
        sl = jnp.sum(oh * x.astype(dt), axis=2)    # [T, E, ...]
        sl = sl > 0.5 if x.dtype == jnp.bool_ else sl
        return sl.reshape((-1,) + sl.shape[2:])    # [T*E, ...]

    def body(k, carry):
        state, metrics = carry
        r = perm[k]
        batch = AgentData(*[flatten_agent(x, r) for x in data])
        state, (pl, vl, kl, it) = update_one_agent(
            ac, cfg, pi_tx, vf_tx, state, batch,
            key=jax.random.fold_in(key, k))
        metrics = UpdateMetrics(
            pi_loss=metrics.pi_loss.at[k].set(pl),
            v_loss=metrics.v_loss.at[k].set(vl),
            kl=metrics.kl.at[k].set(kl),
            pi_iters=metrics.pi_iters.at[k].set(it),
        )
        return state, metrics

    metrics0 = UpdateMetrics(
        pi_loss=jnp.zeros((n_upd,), jnp.float32),
        v_loss=jnp.zeros((n_upd,), jnp.float32),
        kl=jnp.zeros((n_upd,), jnp.float32),
        pi_iters=jnp.zeros((n_upd,), jnp.int32),
    )
    return jax.lax.fori_loop(0, n_upd, body, (state, metrics0))
