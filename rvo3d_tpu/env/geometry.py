"""Pure-jnp geometry kernels: cones, collision times, kinematics, deviation.

These are the parity-critical primitives. Each function documents the
reference semantics it reproduces (file:line into /root/reference). All
functions are vectorized over arbitrary leading batch axes and contain no
data-dependent Python control flow, so they trace cleanly under jit/vmap.

Design note (TPU): everything here is VPU elementwise math over small
trailing axes; XLA fuses the whole per-step geometry pipeline into a handful
of kernels. The batch axes ([envs, agents] or [envs, agents, agents]) supply
the parallelism; there are no Python loops over agents anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf


def rnd(x, decimals: int, enabled: bool = True):
    """Parity rounding. The reference rounds pervasively (obs to 2 decimals,
    rewards/des_vel to 3, cone angles to 2). jnp.round matches np.round's
    scale-round-unscale half-to-even behavior."""
    if not enabled:
        return x
    return jnp.round(x, decimals)


def wraptopi(theta):
    """Single-branch wrap used by the reference (vel_obs3D.py:195-202).
    NOTE: intentionally NOT a full modular wrap — the reference applies at
    most one correction of 2*pi, and inputs here are already in [0, pi]."""
    theta = jnp.where(theta > jnp.pi, theta - 2 * jnp.pi, theta)
    theta = jnp.where(theta < -jnp.pi, theta + 2 * jnp.pi, theta)
    return theta


def norm3(v, axis=-1):
    """Explicit 3-vector norm (sum-of-squares then sqrt) so the float op
    order matches the NumPy oracle exactly."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def cone_alpha(dis, r_sum, *, parity_round: bool = True):
    """VO cone apex half-angle: asin((ra+rb)/|pb-pa|), wrapped + rounded.
    Reference: vel_obs3D.get_alpha (vel_obs3D.py:8-17). Caller guarantees
    dis > r_sum (the collision branch returns earlier); we clamp the ratio
    for masked-out lanes so no NaNs are produced."""
    ratio = jnp.clip(r_sum / jnp.maximum(dis, 1e-30), -1.0, 1.0)
    alpha = wraptopi(jnp.arcsin(ratio))
    return rnd(alpha, 2, parity_round)


def reciprocal_apex(pa, pra, prb, va, vb):
    """Priority-weighted reciprocal VO apex:
    PAA = pr * (2*pa + (va+vb)*t), pr = pra/(pra+prb), t = 1.
    Reference: vel_obs3D.get_PAA (vel_obs3D.py:19-32)."""
    pr = pra / (pra + prb)
    return pr[..., None] * (2.0 * pa + (va + vb) * 1.0)


def angle_between(a, b, *, parity_round: bool = True):
    """Angle between vectors with the reference's zero-denominator guard:
    cos = dot/(|a||b|) if |a||b| != 0 else 0 → angle = acos(cos), wrapped,
    rounded to 2 decimals. Reference: vel_obs3D.get_beta (vel_obs3D.py:44-66)."""
    dot = jnp.sum(a * b, axis=-1)
    mag = norm3(a) * norm3(b)
    cos = jnp.where(mag != 0.0, dot / jnp.where(mag != 0.0, mag, 1.0), 0.0)
    cos = jnp.clip(cos, -1.0, 1.0)
    ang = wraptopi(jnp.arccos(cos))
    return rnd(ang, 2, parity_round)


def angle_between_eps(a, b):
    """The ir_gym variant with epsilon-protected magnitudes (the later,
    shadowing definition wins in the reference class body):
    ir_gym.calculate_angle_between_vectors (ir_gym.py:447-473).
    mag = sqrt(sum_sq + 1e-8); zero-vector (mag < 1e-6) → angle 0;
    cos clipped to [-1+1e-8, 1-1e-8]."""
    eps = 1e-8
    mag_a = jnp.sqrt(jnp.sum(a * a, axis=-1) + eps)
    mag_b = jnp.sqrt(jnp.sum(b * b, axis=-1) + eps)
    dot = jnp.sum(a * b, axis=-1)
    cos = dot / (mag_a * mag_b)
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    ang = jnp.arccos(cos)
    return jnp.where((mag_a < 1e-6) | (mag_b < 1e-6), 0.0, ang)


def vo_expected_time(rel_p, rel_v_origin, r_sum):
    """Expected collision time of the reciprocal relative motion.

    Solves |rel_p + t * rel_v|^2 = r_sum^2 with rel_v = -rel_v_origin
    (the reference flips the sign internally). Returns:
      0        if already overlapping (c <= 0)
      inf      if discriminant <= 0 (no real crossing)
      -1       if both roots negative
      min positive root otherwise.
    Reference: vel_obs3D.cal_vo_exp_tim (vel_obs3D.py:145-182).
    rel_p, rel_v_origin: [..., 3]."""
    rel_v = -rel_v_origin
    a = jnp.sum(rel_v * rel_v, axis=-1)
    b = 2.0 * jnp.sum(rel_p * rel_v, axis=-1)
    c = jnp.sum(rel_p * rel_p, axis=-1) - r_sum * r_sum

    disc = b * b - 4.0 * a * c
    safe_a = jnp.where(a != 0.0, a, 1.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b + sq) / (2.0 * safe_a)
    t2 = (-b - sq) / (2.0 * safe_a)
    both_neg = (t1 < 0.0) & (t2 < 0.0)
    t3 = jnp.where(t1 >= 0.0, t1, INF)
    t4 = jnp.where(t2 >= 0.0, t2, INF)
    t_pos = jnp.minimum(t3, t4)

    t = jnp.where(disc <= 0.0, INF, jnp.where(both_neg, -1.0, t_pos))
    return jnp.where(c <= 0.0, 0.0, t)


def vo_cone_outside(pa, action, paa, rel, alpha, delta_t, *, parity_round=True):
    """Membership test: is the (doubled) post-action position outside the VO
    cone?  Panew = pa + 2*action*dt; beta = angle(rel, Panew - PAA);
    outside iff NOT (alpha > beta).
    Reference: rvo_inter.vo_out_jud_vector (rvo_inter.py:212-228)."""
    panew = pa + 2.0 * action * delta_t
    arr = panew - paa
    beta = angle_between(rel, arr, parity_round=parity_round)
    return ~(alpha > beta)


def point_line_deviation(start, end, p):
    """Distance from p to the infinite line through (start, end); 0 when
    start == end. NOTE: the reference does NOT clamp the projection to the
    segment — this is point-to-LINE distance.
    Reference: drone.calculate_deviation (drone.py:366-406)."""
    d = end - start
    mag = norm3(d)
    safe_mag = jnp.where(mag != 0.0, mag, 1.0)
    d_hat = d / safe_mag[..., None]
    t = jnp.sum((p - start) * d_hat, axis=-1)
    q = start + t[..., None] * d_hat
    dev = norm3(p - q)
    return jnp.where(mag == 0.0, 0.0, dev)


def polyline_length(waypoints, n_points):
    """Total route length over the first n_points waypoints of a padded
    [W, 3] array. Reference: drone.calculate_total_length (drone.py:409-429)."""
    seg = waypoints[1:] - waypoints[:-1]                      # [W-1, 3]
    seg_len = norm3(seg)
    idx = jnp.arange(seg.shape[0])
    mask = idx < (n_points - 1)
    return jnp.sum(jnp.where(mask, seg_len, 0.0))


def desired_velocity(pos, des, vel_max, goal_threshold, *, parity_round=True):
    """Max-speed unit vector toward the current waypoint, rounded to 3
    decimals; zero inside the goal threshold.
    Reference: drone.cal_des_vel (drone.py:199-210) via relative()
    (drone.py:340-352) and angles_to_direction (drone.py:319-328).
    pos, des: [..., 3]; vel_max scalar or [..., 3]."""
    dif = des - pos
    dis = norm3(dif)
    azimuth = jnp.arctan2(dif[..., 1], dif[..., 0])
    horiz = jnp.sqrt(dif[..., 0] ** 2 + dif[..., 1] ** 2)
    elevation = jnp.arctan2(dif[..., 2], horiz)
    direction = jnp.stack(
        [
            jnp.cos(azimuth) * jnp.cos(elevation),
            jnp.sin(azimuth) * jnp.cos(elevation),
            jnp.sin(elevation),
        ],
        axis=-1,
    )
    vel = rnd(vel_max * direction, 3, parity_round)
    return jnp.where((dis > goal_threshold)[..., None], vel, 0.0)


def kinematic_step(vel, yaw_deg, pitch_deg, action, max_acc, max_angle_change):
    """Speed/yaw/pitch kinematics.

    The action in [-1,1]^3 maps to (acceleration delta, yaw delta, pitch
    delta); speed is recomputed from the Cartesian velocity each step while
    yaw/pitch persist and integrate.
    Reference: drone.kinematicstep + helpers (drone.py:431-490), invoked from
    move_forward (drone.py:96-105 — `self.velocity = norm(self.vel)` then
    `kinematicstep(act, self.velocity)`).

    Returns (new_vel_vec [...,3], new_yaw_deg, new_pitch_deg, new_speed)."""
    speed = norm3(vel)
    acc_delta = jnp.clip(action[..., 0] * max_acc, -max_acc, max_acc)
    yaw_delta = jnp.clip(
        action[..., 1] * max_angle_change, -max_angle_change, max_angle_change
    )
    pitch_delta = jnp.clip(
        action[..., 2] * max_angle_change, -max_angle_change, max_angle_change
    )

    new_speed = jnp.maximum(speed + acc_delta * 1.0, 0.0)
    new_yaw = (yaw_deg + yaw_delta) % 360.0
    new_pitch = jnp.clip(pitch_deg + pitch_delta, -90.0, 90.0)

    yaw_rad = jnp.deg2rad(new_yaw)
    pitch_rad = jnp.deg2rad(new_pitch)
    new_vel = jnp.stack(
        [
            new_speed * jnp.cos(pitch_rad) * jnp.cos(yaw_rad),
            new_speed * jnp.cos(pitch_rad) * jnp.sin(yaw_rad),
            new_speed * jnp.sin(pitch_rad),
        ],
        axis=-1,
    )
    return new_vel, new_yaw, new_pitch, new_speed


def deviation_penalty(deviation):
    """Sigmoid route-deviation penalty:
    -1.5 * 2 / (1 + exp(-(10*d - 5)/0.3)).
    Reference: ir_gym.calculate_penalty_with_exp (ir_gym.py:476-490)."""
    d = deviation * 10.0
    return -1.5 * (2.0 / (1.0 + jnp.exp(-(d - 5.0) / 0.3)))


def out_of_map(pos, map_size):
    """True if any coordinate leaves [0, map_size].
    Reference: drone.drone_out_map (drone.py:213-225)."""
    below = jnp.any(pos < 0.0, axis=-1)
    above = jnp.any(pos > map_size, axis=-1)
    return below | above
