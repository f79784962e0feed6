"""Vectorized 3D reciprocal-velocity-obstacle engine.

The reference builds VO cones with Python loops over agent pairs
(uaisa_env/vel_obs/rvo_inter.py:20-196). Here the all-pairs computation is a
single masked [N, N] tensor program: every branch of config_vo_circle2
becomes a lane-select, the neighbor filter becomes a mask, and the
urgency-sorted top-nm selection becomes a per-row lexsort + gather. Under
vmap over env instances this is [E, N, N] elementwise math that XLA fuses
into the surrounding step.

Branch semantics reproduced exactly (rvo_inter.config_vo_circle2,
rvo_inter.py:116-196):
  collision : dis <= r_a + r_b            -> obs [p, rel, 0, 0, 0]
  back-off  : dot(v_a, rel) <= 0          -> obs [p, rel, 0, -1, -1]
  normal    : cone alpha/apex/membership  -> obs [PAA, rel, alpha, min_dis,
                                                  1/(exp_time+0.2)]
Neighbor gates are the reference's hard-coded ranges (preprocess,
rvo_inter.py:85-107): drones within 10 m (self excluded by exact position
equality), buildings with h > z-2 and horizontal distance <= 5 m.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env import geometry as geo

INF = jnp.inf


class PairwiseVO(NamedTuple):
    """Per-ordered-pair (i=self, j=other) quantities, all [N, M] where M is
    the number of 'other' participants (the N drones themselves, plus any
    dynamic sphere obstacles appended as extra VO participants)."""

    valid: jnp.ndarray        # neighbor gate: not-self-position and dis <= 10
    collision: jnp.ndarray    # pair collision branch hit
    vo_flag: jnp.ndarray      # inside cone and expected time < threshold
    exp_time: jnp.ndarray     # expected collision time for flagged pairs
    obs9: jnp.ndarray         # [N, M, 9] observation block per pair
    min_dis4: jnp.ndarray     # the 5th return slot of config_vo_circle2
                              #  (r_a+r_b | real dis | real dis - r_b per branch)
    sort_t: jnp.ndarray       # input_exp_time sort key (urgency, ascending)
    sort_d: jnp.ndarray       # min_dis secondary sort key (descending)


def pairwise_vo(states: jnp.ndarray, actions: jnp.ndarray, p: EnvParams,
                others: jnp.ndarray | None = None) -> PairwiseVO:
    """states: [N, 12] = [pos(3), vel(3), radius, priority, des_vel(3), dev];
    actions: [N, 3]; others: [M, 8] = [pos(3), vel(3), radius, priority]
    (defaults to the drones themselves). Returns per-pair branch results."""
    pos = states[:, 0:3]
    vel = states[:, 3:6]
    radius = states[:, 6]
    prio = states[:, 7]
    if others is None:
        others = states[:, 0:8]
    o_pos = others[:, 0:3]
    o_vel = others[:, 3:6]
    o_radius = others[:, 6]
    o_prio = others[:, 7]

    # reference zeroes near-zero actions (rvo_inter.py:118-119)
    act_norm = geo.norm3(actions)
    act = jnp.where((act_norm < 1e-5)[:, None], 0.0, actions)

    rel = o_pos[None, :, :] - pos[:, None, :]           # [N, M, 3]: p_j - p_i
    dis = geo.norm3(rel)                                # real distance
    r_sum = radius[:, None] + o_radius[None, :]

    pos_equal = jnp.all(pos[:, None, :] == o_pos[None, :, :], axis=-1)
    valid = (~pos_equal) & (dis <= p.drone_range)

    if p.env_train:
        collision = dis <= r_sum
    else:
        collision = dis <= (radius[:, None] - p.exp_radius + o_radius[None, :])

    dot = jnp.sum(vel[:, None, :] * rel, axis=-1)       # v_i . (p_j - p_i)
    backoff = (~collision) & (dot <= 0.0)
    normal = (~collision) & (~backoff)

    # --- normal branch cone math (masked lanes are made NaN-safe) ---
    alpha = geo.cone_alpha(dis, r_sum, parity_round=p.parity_rounding)
    paa = geo.reciprocal_apex(
        pos[:, None, :],
        jnp.broadcast_to(prio[:, None], dis.shape),
        jnp.broadcast_to(o_prio[None, :], dis.shape),
        vel[:, None, :],
        o_vel[None, :, :],
    )                                                    # [N, M, 3]
    outside = geo.vo_cone_outside(
        pos[:, None, :], act[:, None, :], paa, rel, alpha, p.delta_t,
        parity_round=p.parity_rounding,
    )
    rel_v_origin = 2.0 * act[:, None, :] - o_vel[None, :, :] - vel[:, None, :]
    t_raw = geo.vo_expected_time(rel, rel_v_origin, r_sum)
    vo_flag = normal & (~outside) & (t_raw < p.ctime_threshold)
    exp_time = jnp.where(vo_flag, t_raw, INF)            # inf when outside/slow
    input_exp_time = 1.0 / (exp_time + 0.2)              # 1/inf -> 0 like numpy
    min_dis_n = dis - o_radius[None, :]                  # real_dis - r_b

    # --- assemble the 9-D block per branch ---
    pos_b = jnp.broadcast_to(pos[:, None, :], rel.shape)
    zeros = jnp.zeros_like(dis)
    m_ones = -jnp.ones_like(dis)
    obs_col = jnp.concatenate(
        [pos_b, rel, zeros[..., None], zeros[..., None], zeros[..., None]], -1
    )
    obs_back = jnp.concatenate(
        [pos_b, rel, zeros[..., None], m_ones[..., None], m_ones[..., None]], -1
    )
    obs_norm = jnp.concatenate(
        [paa, rel, alpha[..., None], min_dis_n[..., None],
         input_exp_time[..., None]], -1
    )
    obs9 = jnp.where(
        collision[..., None], obs_col,
        jnp.where(backoff[..., None], obs_back, obs_norm),
    )

    # 5th return slot of config_vo_circle2 per branch
    min_dis4 = jnp.where(collision, r_sum, jnp.where(backoff, dis, min_dis_n))

    flagged = vo_flag & valid
    sort_t = jnp.where(flagged, input_exp_time, -INF)
    sort_d = jnp.where(flagged, min_dis_n, 0.0)
    return PairwiseVO(
        valid=valid, collision=collision, vo_flag=vo_flag, exp_time=exp_time,
        obs9=obs9, min_dis4=min_dis4, sort_t=sort_t, sort_d=sort_d,
    )


def building_collision(pos: jnp.ndarray, radius: jnp.ndarray,
                       buildings: jnp.ndarray, building_mask: jnp.ndarray,
                       p: EnvParams) -> jnp.ndarray:
    """Per-agent cylinder-building collision under the preprocess gates.

    Combines rvo_inter.preprocess building filter (rvo_inter.py:99-105:
    h > z - 2 and horizontal distance <= 5) with check_col_with_budilding
    (rvo_inter.py:198-209: z <= h and 2D distance <= r + br).
    pos [N,3], radius [N], buildings [B,4] (x,y,h,r). Returns [N] bool."""
    bx, by, bh, br = (buildings[:, 0], buildings[:, 1],
                      buildings[:, 2], buildings[:, 3])
    dx = pos[:, None, 0] - bx[None, :]
    dy = pos[:, None, 1] - by[None, :]
    d2 = jnp.sqrt(dx * dx + dy * dy)                     # [N, B]
    in_range = (bh[None, :] > pos[:, None, 2] - p.building_z_slack) & (
        d2 <= p.building_range
    )
    hit = (pos[:, None, 2] <= bh[None, :]) & (d2 <= radius[:, None] + br[None, :])
    return jnp.any(building_mask[None, :] & in_range & hit, axis=-1)


class VORewardInfo(NamedTuple):
    vo_flag: jnp.ndarray       # [N] any flagged neighbor
    min_exp_time: jnp.ndarray  # [N] min expected time over flagged (inf if none)
    min_dis: jnp.ndarray       # [N] min of the per-pair 5th slot over valid


def vo_reward_info(states: jnp.ndarray, actions: jnp.ndarray,
                   p: EnvParams,
                   others: jnp.ndarray | None = None) -> VORewardInfo:
    """config_vo_reward aggregation (rvo_inter.py:63-83): moving
    participants only, no buildings, no top-k — just the urgency aggregates
    that feed the reward."""
    pw = pairwise_vo(states, actions, p, others)
    flagged = pw.vo_flag & pw.valid
    vo_any = jnp.any(flagged, axis=-1)
    min_exp = jnp.min(jnp.where(flagged, pw.exp_time, INF), axis=-1)
    min_dis = jnp.min(jnp.where(pw.valid, pw.min_dis4, INF), axis=-1)
    return VORewardInfo(vo_any, min_exp, min_dis)


class VOObservation(NamedTuple):
    obs_nbr: jnp.ndarray       # [N, nm, 9] urgency-ascending; valid slots at end
    obs_mask: jnp.ndarray      # [N, nm] bool
    vo_flag: jnp.ndarray       # [N]
    min_exp_time: jnp.ndarray  # [N]
    collision: jnp.ndarray     # [N] pair-collision OR building-collision


def vo_observe(states: jnp.ndarray, actions: jnp.ndarray,
               buildings: jnp.ndarray, building_mask: jnp.ndarray,
               p: EnvParams,
               others: jnp.ndarray | None = None) -> VOObservation:
    """config_vo_inf (rvo_inter.py:20-61): flagged neighbor blocks sorted by
    (input_exp_time asc, min_dis desc), keep the nm most urgent (the LAST nm
    of the sorted list), plus collision/urgency aggregates.

    The reference's Python stable sort + tail-slice maps to a stable
    per-row lexsort; unflagged pairs get a -inf primary key so they sort to
    the front and are cut by the tail window, exactly like never being
    appended to obs_vo_list."""
    n = states.shape[0]
    pw = pairwise_vo(states, actions, p, others)
    m = pw.valid.shape[1]
    flagged = pw.vo_flag & pw.valid

    vo_any = jnp.any(flagged, axis=-1)
    min_exp = jnp.min(jnp.where(flagged, pw.exp_time, INF), axis=-1)

    pair_col = jnp.any(pw.collision & pw.valid, axis=-1)
    bld_col = building_collision(
        states[:, 0:3], states[:, 6], buildings, building_mask, p
    )
    collision = pair_col | bld_col

    # per-row stable sort: primary sort_t ascending, secondary -min_dis
    # ascending (== min_dis descending), full ties keep j ascending — the
    # same order as Python's stable reverse sort on (-t, d) keys
    # (rvo_inter.py:50) followed by the tail slice (rvo_inter.py:53-56).
    order = jnp.lexsort((-pw.sort_d, pw.sort_t), axis=-1)   # [N, M]
    k = min(p.neighbor_num, m)
    tail = order[:, m - k:]                                  # [N, k] ascending urgency
    # one-hot selection instead of take_along_axis: the axon TPU backend
    # miscompiles small-gather lowerings under some fusion contexts (see
    # env/state.py:_wp_select and RESULTS.md "TPU backend gather bug").
    # Broadcast-multiply + sum, NOT a batched einsum: the dot_general form
    # intermittently deadlocks XLA:CPU's in-process collective rendezvous
    # on the virtual test mesh. 0/1 weights keep the values exact.
    # PRECONDITION: every entry of obs9 must be FINITE — 0*inf/0*nan from a
    # non-selected column would contaminate all selected rows. This holds
    # because input_exp_time = 1/(t+0.2) maps the inf exp_time sentinel to
    # a finite value (geometry.input_exp_time) and all other obs9 channels
    # are positions/velocities/angles. If a future channel carries an
    # inf/nan sentinel, it must be masked BEFORE this selection
    # (tests/test_geometry.py::test_one_hot_selection_finiteness guards
    # this).
    sel = jax.nn.one_hot(tail, m, dtype=pw.obs9.dtype)              # [N, k, M]
    obs_k = jnp.sum(sel[..., None] * pw.obs9[:, None, :, :], axis=2)
    mask_k = jnp.sum(sel * flagged[:, None, :].astype(pw.obs9.dtype),
                     axis=-1) > 0.5                                  # [N, k]

    nm = p.neighbor_num
    obs_nbr = jnp.zeros((n, nm, 9), states.dtype)
    obs_mask = jnp.zeros((n, nm), bool)
    obs_nbr = obs_nbr.at[:, nm - k:].set(jnp.where(mask_k[..., None], obs_k, 0.0))
    obs_mask = obs_mask.at[:, nm - k:].set(mask_k)
    return VOObservation(obs_nbr, obs_mask, vo_any, min_exp, collision)
