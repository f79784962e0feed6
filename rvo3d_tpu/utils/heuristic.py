"""Analytic waypoint-tracking controller (pure jnp).

The action space is kinematic increments [acc, Δyaw/90°, Δpitch/90°]
(reference: drone._action_to_control, drone.py:435-447), so a desired
velocity VECTOR is not a valid action — the reference's own smoke script
feeds cal_des_vel anyway and the drones barely move (gym_env_test.py:12-16).
This controller does it properly: steer yaw/pitch toward the current
waypoint and regulate speed, giving a real non-learning baseline policy for
smoke tests, benchmarks, and rendering demos.
"""

from __future__ import annotations

import jax.numpy as jnp

from rvo3d_tpu.env import geometry as geo
from rvo3d_tpu.env.state import DroneState, WorldSpec


def waypoint_controller(state: DroneState, world: WorldSpec,
                        cruise_speed: float = 0.8,
                        dt: float = 1.0) -> jnp.ndarray:
    """Returns actions [..., N, 3] in [-1, 1]."""
    cur_des = state.current_des(world)
    dif = cur_des - state.pos
    dist = geo.norm3(dif)
    t_yaw = jnp.degrees(jnp.arctan2(dif[..., 1], dif[..., 0])) % 360.0
    horiz = jnp.sqrt(dif[..., 0] ** 2 + dif[..., 1] ** 2)
    t_pitch = jnp.degrees(jnp.arctan2(dif[..., 2], horiz))
    dyaw = ((t_yaw - state.yaw + 180.0) % 360.0) - 180.0
    dpitch = t_pitch - state.pitch
    speed = geo.norm3(state.vel)
    acc = jnp.clip(jnp.minimum(cruise_speed, dist / dt) - speed, -1.0, 1.0)
    return jnp.stack(
        [acc,
         jnp.clip(dyaw / 90.0, -1.0, 1.0),
         jnp.clip(dpitch / 90.0, -1.0, 1.0)],
        axis=-1,
    )
