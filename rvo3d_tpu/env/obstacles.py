"""Dynamic sphere obstacles — the TPU-native realization of the reference's
dormant obs_circle extension (reference: 扩展/obs_circle.py:6-195; never
imported by the main code, SURVEY §1).

Spheres are extra VO participants: they join the all-pairs cone math,
neighbor top-k, reward shaping, and collision checks exactly like drones
(rvo.pairwise_vo's `others` block) but take no policy actions. Per-sphere
motion models:

  STATIC (0): holds position (obs_circle obs_model='static')
  LINEAR (1): constant velocity, reflecting off the map bounds (keeps
              long-horizon episodes populated; extension beyond the
              reference, which had no bounds handling)
  GOAL   (2): max-speed velocity toward a goal, freezing inside the goal
              threshold (obs_circle.move_forward stop semantics,
              obs_circle.py:103-116 + cal_des_vel_omni :164-177)

The norm-cone membership test (obs_circle.inside, :39-58) and the
receding-horizon state prediction (state_predict_b, :121-133) are provided
as vectorized utilities.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

STATIC, LINEAR, GOAL = 0, 1, 2


class SphereSpec(NamedTuple):
    """Static sphere definitions, padded to [S, ...]."""

    init: jnp.ndarray    # [S, 8] pos(3), vel(3), radius, priority
    goal: jnp.ndarray    # [S, 3]
    model: jnp.ndarray   # [S] int32 motion model code
    mask: jnp.ndarray    # [S] bool

    @property
    def count(self) -> int:
        return self.init.shape[0]


def make_sphere_spec(spheres: Optional[Sequence[dict]] = None,
                     priority: float = 5.0,
                     dtype=np.float32) -> SphereSpec:
    """spheres: list of dicts with keys pos, radius and optional vel, goal,
    model ('static'|'linear'|'goal')."""
    spheres = spheres or []
    s = len(spheres)
    init = np.zeros((s, 8), dtype)
    goal = np.zeros((s, 3), dtype)
    model = np.zeros((s,), np.int32)
    codes = {"static": STATIC, "linear": LINEAR, "goal": GOAL}
    for i, sp in enumerate(spheres):
        init[i, 0:3] = np.asarray(sp["pos"], dtype)
        init[i, 3:6] = np.asarray(sp.get("vel", (0, 0, 0)), dtype)
        init[i, 6] = sp["radius"]
        init[i, 7] = sp.get("priority", priority)
        goal[i] = np.asarray(sp.get("goal", sp["pos"]), dtype)
        model[i] = codes[sp.get("model", "static")]
    return SphereSpec(
        init=jnp.asarray(init), goal=jnp.asarray(goal),
        model=jnp.asarray(model), mask=jnp.ones((s,), bool),
    )


def step_spheres(pos: jnp.ndarray, vel: jnp.ndarray, spec: SphereSpec,
                 map_size: jnp.ndarray, dt: float,
                 goal_threshold: float = 0.1):
    """Advance sphere states one step. pos/vel: [S, 3]. Returns (pos', vel')."""
    if spec.count == 0:
        return pos, vel
    radius = spec.init[:, 6:7]

    # GOAL: max-|v_init| velocity toward goal, zero inside threshold
    to_goal = spec.goal - pos
    dist = jnp.sqrt(jnp.sum(to_goal * to_goal, axis=-1, keepdims=True))
    speed = jnp.sqrt(jnp.sum(spec.init[:, 3:6] ** 2, axis=-1, keepdims=True))
    goal_vel = jnp.where(
        dist > goal_threshold,
        to_goal / jnp.maximum(dist, 1e-9) * speed,
        0.0,
    )

    vel = jnp.where(spec.model[:, None] == GOAL, goal_vel, vel)
    vel = jnp.where(spec.model[:, None] == STATIC, 0.0, vel)

    new_pos = pos + vel * dt

    # LINEAR: reflect at the walls [r, map_size - r]
    lo = radius
    hi = map_size[None, :] - radius
    is_lin = spec.model[:, None] == LINEAR
    bounce = is_lin & ((new_pos < lo) | (new_pos > hi))
    vel = jnp.where(bounce, -vel, vel)
    new_pos = jnp.where(is_lin, jnp.clip(new_pos, lo, hi), new_pos)

    return new_pos, vel


def sphere_states8(pos: jnp.ndarray, vel: jnp.ndarray,
                   spec: SphereSpec) -> jnp.ndarray:
    """[S, 8] rows [pos, vel, radius, priority] for the VO 'others' block."""
    return jnp.concatenate([pos, vel, spec.init[:, 6:8]], axis=-1)


def inside_sphere(point: jnp.ndarray, center: jnp.ndarray,
                  radius: jnp.ndarray) -> jnp.ndarray:
    """Norm-cone membership ||p - c|| <= r (obs_circle.inside/norm_cone,
    obs_circle.py:39-58), vectorized over leading axes."""
    d = point - center
    return jnp.sqrt(jnp.sum(d * d, axis=-1)) <= radius


def predict_states(pos: jnp.ndarray, vel: jnp.ndarray, radius: jnp.ndarray,
                   dt: float, receding: int = 5) -> jnp.ndarray:
    """Receding-horizon constant-velocity prediction
    (obs_circle.state_predict_b, obs_circle.py:121-133).
    Returns [receding+1, S, 4] rows (x, y, z, r)."""
    ks = jnp.arange(receding + 1, dtype=pos.dtype)[:, None, None]
    preds = pos[None] + ks * vel[None] * dt
    r = jnp.broadcast_to(radius[None, :, None],
                         (receding + 1, radius.shape[0], 1))
    return jnp.concatenate([preds, r], axis=-1)
