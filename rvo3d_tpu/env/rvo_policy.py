"""Classic (non-learning) reciprocal-velocity-obstacle controller.

Capability of the reference's legacy reciprocal_vel_obs policy (reference:
uaisa_env/vel_obs/reciprocal_vel_obs.py:21-166): grid-search candidate
velocities (0.5 spacing, minimum speed 0.3, :85-107), keep those outside
every neighbor's RVO cone (:109-128), pick the feasible candidate closest
to the desired velocity (:131-138), otherwise minimize an
expected-collision-time penalty (:140-166). The reference file is dead code
and crashes as shipped (`arr_AA_Anew.append = ...`, :122); this is a
working vectorized re-expression.

Because the environment's action space is kinematic increments, the chosen
velocity is converted to [acc, Δyaw, Δpitch] the same way the analytic
waypoint controller does — giving a complete non-learning avoidance
baseline for smoke tests and benchmark comparisons.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env import geometry as geo
from rvo3d_tpu.env.env import _vo_others, drone_states_12
from rvo3d_tpu.env.state import DroneState, WorldSpec


def _candidate_grid(vmax: float, spacing: float, min_speed: float
                    ) -> jnp.ndarray:
    """[C, 3] velocity candidates: a cubic grid plus the zero velocity."""
    axis = jnp.arange(-vmax, vmax + 1e-6, spacing)
    gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    cands = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    speed = geo.norm3(cands)
    ok = speed >= min_speed
    # keep static shape: invalid candidates get +inf cost later
    return cands, ok


def _cone_blocked(pos, vel_cand, paa, rel, alpha, valid, delta_t):
    """Is candidate velocity inside any neighbor's RVO cone?
    pos [3], vel_cand [C, 3], paa/rel [M, 3], alpha [M], valid [M]."""
    panew = pos[None, None, :] + 2.0 * vel_cand[:, None, :] * delta_t
    arr = panew - paa[None, :, :]                    # [C, M, 3]
    beta = geo.angle_between(
        jnp.broadcast_to(rel[None, :, :], arr.shape), arr,
        parity_round=False,
    )                                                # [C, M]
    inside = (alpha[None, :] > beta) & valid[None, :]
    return jnp.any(inside, axis=-1)                  # [C]


def rvo_velocity(world: WorldSpec, state: DroneState, p: EnvParams,
                 spacing: float = 0.25, min_speed: float = 0.0,
                 vmax: float = 1.0, margin: float | None = None,
                 slowdown: bool = False) -> jnp.ndarray:
    """Choose per-drone collision-free velocities [N, 3].

    Beyond the reference's cone test (which is continuous-time), candidates
    are also screened by the environment's actual collision rule — the
    DISCRETE endpoint distance after one dt (env_drones.py:65-79 checks
    post-step positions only). With dt=1 the two differ materially: a
    continuously-safe velocity pair can still sample endpoints within
    r_sum, and vice versa. `margin` (default p.exp_radius) inflates radii
    in both tests to absorb the neighbor's replanning."""
    if margin is None:
        margin = p.exp_radius
    states12, _ = drone_states_12(world, state, p)
    others = _vo_others(world, state, states12)
    if others is None:
        others = states12[:, 0:8]

    pos = states12[:, 0:3]
    vel = states12[:, 3:6]
    radius = states12[:, 6]
    prio = states12[:, 7]
    des = states12[:, 8:11]
    if slowdown:
        # arrival slowdown (opt-in; the env's own des_vel is the
        # reference's max-speed unit vector, drone.py:199-210): when one
        # step from the active waypoint, aim to LAND on it instead of
        # stepping across the goal ball. At dt=1 and speed ~1 a drone can
        # overfly the 0.4-radius arrival ball every step and orbit
        # forever — measured on world16_dense (drone 4, runs/bc_evals/
        # expert_margin_sweep.txt); 15/16 drones arrive by luck of
        # geometry, one never does.
        tgt = state.current_des(world)
        land = (tgt - pos) / p.dt
        des = jnp.where(
            (geo.norm3(land) < geo.norm3(des))[:, None], land, des)

    o_pos, o_vel = others[:, 0:3], others[:, 3:6]
    o_radius, o_prio = others[:, 6], others[:, 7]

    rel = o_pos[None, :, :] - pos[:, None, :]        # [N, M, 3]
    dis = geo.norm3(rel)
    r_sum = radius[:, None] + o_radius[None, :]
    pos_equal = jnp.all(pos[:, None, :] == o_pos[None, :, :], axis=-1)
    valid = (~pos_equal) & (dis <= p.drone_range) & (dis > r_sum)

    r_safe = jnp.minimum(r_sum + margin, dis - 1e-3)  # keep asin in range
    alpha = geo.cone_alpha(dis, r_safe, parity_round=False)
    paa = geo.reciprocal_apex(
        pos[:, None, :],
        jnp.broadcast_to(prio[:, None], dis.shape),
        jnp.broadcast_to(o_prio[None, :], dis.shape),
        vel[:, None, :], o_vel[None, :, :],
    )

    cands, cand_ok = _candidate_grid(vmax, spacing, min_speed)

    def per_drone(pos_i, paa_i, rel_i, alpha_i, valid_i, vel_i, des_i,
                  radius_i, o_r):
        blocked = _cone_blocked(pos_i, cands, paa_i, rel_i, alpha_i,
                                valid_i, p.delta_t)
        # map awareness (improvement over the reference's broken legacy
        # controller, which happily dives out of bounds): reject candidates
        # whose 2-step lookahead leaves the map
        future = pos_i[None, :] + 2.0 * cands * p.dt
        oob = jnp.any(
            (future < radius_i) | (future > world.map_size[None, :] - radius_i),
            axis=-1,
        )
        # discrete endpoint screen: next-step separation under constant
        # neighbor velocity must clear the inflated radius (the env checks
        # exactly this distance, at margin=0)
        end_rel = (rel_i[None, :, :]
                   + (o_vel[None, :, :] - cands[:, None, :]) * p.dt)
        end_close = jnp.any(
            (geo.norm3(end_rel) <= radius_i + o_r[None, :] + margin)
            & valid_i[None, :], axis=-1)             # [C]
        blocked = blocked | end_close

        dist_to_des = geo.norm3(cands - des_i[None, :])
        feasible = (~blocked) & cand_ok & (~oob)
        any_feasible = jnp.any(feasible)

        # right-of-way convention: a symmetric encounter (head-on) has two
        # mirror-image dodges of EQUAL desired-velocity cost; the argmin
        # then flips between them under tiny state changes, which makes the
        # expert's action a multimodal function of state — an MSE behavior
        # clone averages the modes to "no dodge" and flies into the
        # conflict (measured: BC loss 8e-3, 0% closed-loop success). Bias
        # deviations toward climb-and-right of the desired track, like
        # aviation right-of-way rules, so the choice is locally unimodal.
        dev = cands - des_i[None, :]
        up = jnp.array([0.0, 0.0, 1.0], cands.dtype)
        right = jnp.cross(des_i, up)
        right = right / (geo.norm3(right) + 1e-9)
        conv = -0.15 * (dev @ up + dev @ right) / (geo.norm3(dev) + 0.3)

        # feasible: closest to desired velocity (vel_select, :131-138)
        cost_feas = jnp.where(feasible, dist_to_des + conv, jnp.inf)

        # infeasible fallback: penalty mixing expected collision time and
        # desired-velocity distance (penalty, :140-166)
        rel_v = 2.0 * cands[:, None, :] - o_vel[None, :, :] - vel_i[None, None, :]
        t_exp = geo.vo_expected_time(
            jnp.broadcast_to(rel_i[None, :, :], rel_v.shape), rel_v,
            radius_i + o_r[None, :],
        )
        t_exp = jnp.where(valid_i[None, :], t_exp, jnp.inf)
        t_min = jnp.min(t_exp, axis=-1)
        penalty = (1.0 / (t_min + 0.2) + dist_to_des
                   + jnp.where(end_close, 10.0, 0.0))
        cost_pen = jnp.where(cand_ok & (~oob), penalty, jnp.inf)

        idx = jnp.where(any_feasible, jnp.argmin(cost_feas),
                        jnp.argmin(cost_pen))
        return cands[idx]

    return jax.vmap(per_drone)(
        pos, paa, rel, alpha, valid, vel, des, radius,
        jnp.broadcast_to(o_radius[None, :], dis.shape),
    )


def velocity_to_action(state: DroneState, target_vel: jnp.ndarray,
                       p: EnvParams) -> jnp.ndarray:
    """Convert a target velocity vector to the kinematic action
    [acc, Δyaw/90°, Δpitch/90°] expected by the env."""
    t_speed = geo.norm3(target_vel)
    t_yaw = jnp.degrees(jnp.arctan2(target_vel[..., 1],
                                    target_vel[..., 0])) % 360.0
    horiz = jnp.sqrt(target_vel[..., 0] ** 2 + target_vel[..., 1] ** 2)
    t_pitch = jnp.degrees(jnp.arctan2(target_vel[..., 2], horiz))
    # zero target velocity: hold heading, kill speed
    zero = t_speed < 1e-9
    t_yaw = jnp.where(zero, state.yaw, t_yaw)
    t_pitch = jnp.where(zero, state.pitch, t_pitch)
    dyaw = ((t_yaw - state.yaw + 180.0) % 360.0) - 180.0
    dpitch = t_pitch - state.pitch
    speed = geo.norm3(state.vel)
    return jnp.stack(
        [jnp.clip(t_speed - speed, -1.0, 1.0),
         jnp.clip(dyaw / p.max_angle_change, -1.0, 1.0),
         jnp.clip(dpitch / p.max_angle_change, -1.0, 1.0)],
        axis=-1,
    )


def rvo_controller(state: DroneState, world: WorldSpec,
                   p: EnvParams | None = None, **kw) -> jnp.ndarray:
    """Drop-in controller(state, world) for record_trajectory / bench."""
    p = p or EnvParams(num_drones=world.num_drones)
    v = rvo_velocity(world, state, p, **kw)
    return velocity_to_action(state, v, p)
