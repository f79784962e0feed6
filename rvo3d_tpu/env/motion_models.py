"""Euler-angle / Ackermann motion-model library (pure jnp, vectorized).

Capability of the reference's dormant 扩展/motion_model.py (reference:
motion_model.py:6-152; never imported by the main code):

  motion_omni       : x' = x + v*dt with optional Gaussian control noise
                      (motion_model.py:6-18)
  euler_rotation    : Z-Y-X Euler rotation matrix from (roll, pitch, yaw)
                      degrees (rotation_matrix_* :20-42)
  motion_euler      : body-frame velocity rotated to world frame and
                      integrated; roll wrapped, pitch/yaw clipped to the
                      steer limit (motion_ackermann :45-89)
  ackermann_preview : bicycle-model rollout over a preview horizon
                      (motion_acker_pre :91-113)
  ackermann_step    : discrete arc/straight step with gear and steer in
                      {-1, 0, 1} (motion_acker_step :115-152)

All functions broadcast over leading batch axes and are jit/vmap-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def motion_omni(state: jnp.ndarray, vel: jnp.ndarray, dt: float,
                noise_key: Optional[jax.Array] = None,
                control_std: float = 0.01) -> jnp.ndarray:
    if noise_key is not None:
        vel = vel + jax.random.normal(noise_key, vel.shape,
                                      vel.dtype) * control_std
    return state + vel * dt


def euler_rotation(roll_deg, pitch_deg, yaw_deg) -> jnp.ndarray:
    """Z-Y-X (yaw @ pitch @ roll) rotation matrices [..., 3, 3]."""
    r = jnp.deg2rad(roll_deg)
    p = jnp.deg2rad(pitch_deg)
    y = jnp.deg2rad(yaw_deg)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr,
                      cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr,
                      sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)


def motion_euler(pos: jnp.ndarray, angles_deg: jnp.ndarray,
                 vel_body: jnp.ndarray, dt: float,
                 steer_limit_deg: float = 90.0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pos [..., 3]; angles_deg [..., 3] (roll, pitch, yaw); vel_body
    [..., 3] (forward, lateral, vertical). Returns (pos', angles')."""
    roll, pitch, yaw = (angles_deg[..., 0], angles_deg[..., 1],
                        angles_deg[..., 2])
    R = euler_rotation(roll, pitch, yaw)
    vel_world = jnp.einsum("...ij,...j->...i", R, vel_body)
    new_pos = pos + vel_world * dt
    roll = ((roll + 180.0) % 360.0) - 180.0
    pitch = jnp.clip(pitch, -steer_limit_deg, steer_limit_deg)
    yaw = jnp.clip(yaw, -steer_limit_deg, steer_limit_deg)
    return new_pos, jnp.stack([roll, pitch, yaw], -1)


def ackermann_preview(state: jnp.ndarray, wheelbase: float = 1.0,
                      vel: float = 1.0, psi: float = 0.0,
                      steer_limit: float = jnp.pi / 4,
                      pre_time: float = 2.0, dt: float = 0.1) -> jnp.ndarray:
    """state [..., 4] = (x, y, phi, psi). Integrates the bicycle model for
    pre_time seconds; returns the final state."""
    steps = int(round(pre_time / dt))
    psi_c = jnp.clip(psi, -steer_limit, steer_limit)

    def body(s, _):
        phi = s[..., 2]
        d = jnp.stack(
            [vel * jnp.cos(phi), vel * jnp.sin(phi),
             jnp.broadcast_to(vel * jnp.tan(psi_c) / wheelbase, phi.shape),
             jnp.zeros_like(phi)], -1)
        s = s + d * dt
        phi = s[..., 2]
        phi = jnp.where(phi > jnp.pi, phi - 2 * jnp.pi, phi)
        phi = jnp.where(phi < -jnp.pi, phi + 2 * jnp.pi, phi)
        s = s.at[..., 2].set(phi)
        s = s.at[..., 3].set(psi_c)
        return s, None

    out, _ = jax.lax.scan(body, state, None, length=steps)
    return out


def ackermann_step(state: jnp.ndarray, gear: float = 1.0, steer: float = 0.0,
                   step_size: float = 0.5, min_radius: float = 1.0
                   ) -> jnp.ndarray:
    """Discrete arc/straight primitive. state [..., 3] = (x, y, theta);
    steer in {-1, 0, 1} (left/straight/right), gear in {-1, 1}."""
    x, y, theta = state[..., 0], state[..., 1], state[..., 2]
    curvature = steer / min_radius
    rot = jnp.abs(steer) * step_size * curvature * gear
    trans = (1.0 - jnp.abs(steer)) * step_size * gear

    cx = x + jnp.cos(theta + steer * jnp.pi / 2) * min_radius
    cy = y + jnp.sin(theta + steer * jnp.pi / 2) * min_radius
    dx, dy = x - cx, y - cy
    nx = cx + jnp.cos(rot) * dx - jnp.sin(rot) * dy + trans * jnp.cos(theta)
    ny = cy + jnp.sin(rot) * dx + jnp.cos(rot) * dy + trans * jnp.sin(theta)
    ntheta = (theta + rot) % (2 * jnp.pi)
    return jnp.stack([jnp.round(nx, 4), jnp.round(ny, 4),
                      jnp.round(ntheta, 4)], -1)
