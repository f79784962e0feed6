"""Reward functions: RVO shaping reward (pre-step) and movement reward
(post-step). reward = rvo_reward + mov_reward (reference: mdin.py:28).

All functions are vectorized over the agent axis [N] (and batch axes under
vmap); the reference's per-agent Python loops (ir_gym.py:50-62, :136-154)
disappear into array ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env import geometry as geo
from rvo3d_tpu.env.rvo import vo_reward_info


def angle_bucket_bonus(angle: jnp.ndarray) -> jnp.ndarray:
    """Bucketed alignment bonus between the desired velocity and the chosen
    action (reference: ir_gym.rvo_reward_cal, ir_gym.py:90-100):
      |angle| < pi/18 -> +3 ; < pi/6 -> +1 ; < pi/3 -> +0.5 ;
      < pi/2 -> 0 ; else -4.  (angle >= 0, bounds strict)."""
    return jnp.where(
        angle < jnp.pi / 18, 3.0,
        jnp.where(
            angle < jnp.pi / 6, 1.0,
            jnp.where(
                angle < jnp.pi / 3, 0.5,
                jnp.where(angle < jnp.pi / 2, 0.0, -4.0),
            ),
        ),
    )


def rvo_reward(states: jnp.ndarray, actions: jnp.ndarray,
               p: EnvParams, others: jnp.ndarray | None = None) -> jnp.ndarray:
    """RVO shaping reward on PRE-step states (ir_gym.rvo_reward_cal,
    ir_gym.py:64-133):
      angle bucket bonus
      + 0.2*|action|/|des_vel|          (reference divides unguarded; an
                                         arrived drone with des_vel=0 yields
                                         inf exactly like numpy would)
      + (p_base + p_urgent*exp(-t/0.5) if any cone flagged and t < 2)
    rounded to 3 decimals. states: [N, 12]; actions: [N, 3] -> [N]."""
    info = vo_reward_info(states, actions, p, others)

    des_vel = geo.rnd(states[:, 8:11], 3, p.parity_rounding)
    denom = geo.norm3(des_vel)
    if p.safe_rewards:
        # An arrived/waypoint-hugging drone has des_vel = 0; the reference's
        # unguarded division (ir_gym.py:88,129) then yields +inf. Clamping the
        # denominator (round 1) turned that inf into ~+0.2|a|*1e6, clipped to
        # +100/step — a reward farm that dominates arrival (+20 once). Zero
        # the whole term where the reference computes garbage instead.
        vel_penalty = jnp.where(
            denom > 0.0,
            0.2 * geo.norm3(actions) / jnp.maximum(denom, 1e-6),
            0.0,
        )
    else:
        vel_penalty = 0.2 * geo.norm3(actions) / denom

    angle = geo.angle_between_eps(des_vel, actions)
    angle_punish = angle_bucket_bonus(angle)

    urgency = jnp.where(
        info.min_exp_time < 2.0,
        p.rvo_p_urgent * jnp.exp(-info.min_exp_time / 0.5),
        0.0,
    )
    safety = jnp.where(info.vo_flag, p.rvo_p_base + urgency, 0.0)

    total = angle_punish + vel_penalty + safety
    if p.safe_rewards:
        total = jnp.clip(total, -100.0, 100.0)
    return geo.rnd(total, 3, p.parity_rounding)


def mov_reward(collision: jnp.ndarray, arrive_reward_flag: jnp.ndarray,
               waypoint_num: jnp.ndarray, n_points_m1: jnp.ndarray,
               dest_arrive_reward_flag: jnp.ndarray, deviation: jnp.ndarray,
               exlen_pos: jnp.ndarray, exlen: jnp.ndarray,
               p: EnvParams) -> jnp.ndarray:
    """Movement/navigation reward on POST-step state (ir_gym.mov_reward,
    ir_gym.py:256-311):
      collision           -> -50 flat (short-circuits everything else)
      waypoint arrival    -> +3 * 0.95^(n_points-1 - i)
      destination arrival -> +20
      route deviation     -> sigmoid penalty (ir_gym.py:476-490)
      extra path length   -> -0.3*log(exlen+1+1e-6) when exlen > 0, floored
                             at -6 (nan also maps to -6)
    rounded to 3 decimals."""
    way = jnp.where(
        arrive_reward_flag,
        p.mov_p_way * 0.95 ** (n_points_m1 - waypoint_num).astype(deviation.dtype),
        0.0,
    )
    dest = jnp.where(dest_arrive_reward_flag, p.mov_p_dest, 0.0)
    dev_pen = geo.deviation_penalty(deviation)

    exlen_raw = p.mov_p_exlen * jnp.log(exlen + 1.0 + 1e-6)
    exlen_raw = jnp.where(
        (exlen_raw < -6.0) | jnp.isnan(exlen_raw), -6.0, exlen_raw
    )
    exlen_pen = jnp.where(exlen_pos, exlen_raw, 0.0)

    total = geo.rnd(way + dest + dev_pen + exlen_pen, 3, p.parity_rounding)
    return jnp.where(collision, p.mov_collision, total)


def osc_reward(vel_hist: jnp.ndarray, parity_rounding: bool = True) -> jnp.ndarray:
    """Oscillation penalty (reference: ir_gym.osc_reward, ir_gym.py:313-332
    — defined but never called; kept here as the same dormant extension,
    vectorized over the agent axis so it can run on rollout buffers).

    vel_hist: [T, N, 3] recent velocities (the reference passes a list of
    12-D states and reads state[3:6]). Per agent: angle change between
    consecutive velocity pairs (the shadowing epsilon-protected angle fn,
    ir_gym.py:447-473), wrapped and rounded to 2 decimals; a
    sign-alternating (+,-,+ / -,+,-) triple among consecutive changes
    (the reference scans j in range(len-3), skipping the final triple —
    replicated) earns -10, else 0. Returns [N]."""
    T = vel_hist.shape[0]
    zeros = jnp.zeros(vel_hist.shape[1], vel_hist.dtype)
    if T < 3:
        return zeros
    ang = geo.angle_between_eps(vel_hist[1:], vel_hist[:-1])   # [T-1, N]
    dif = geo.wraptopi(ang[1:] - ang[:-1])                     # [T-2, N]
    dif = geo.rnd(dif, 2, parity_rounding)
    L = dif.shape[0]
    if L < 4:
        return zeros
    a, b, c = dif[: L - 3], dif[1 : L - 2], dif[2 : L - 1]
    osc = ((a > 0) & (b < 0) & (c > 0)) | ((a < 0) & (b > 0) & (c < 0))
    return jnp.where(jnp.any(osc, axis=0), -10.0, 0.0).astype(vel_hist.dtype)
