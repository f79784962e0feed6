"""World and environment state PyTrees.

The reference scatters per-drone state across Python objects
(uaisa_env/drone_envs/drone.py:14-82). Here the whole fleet is a fixed-shape
PyTree of arrays with leading agent axis [N] (and [E, N] once vmapped over
env instances), so the entire step is one fused XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rvo3d_tpu.env.obstacles import SphereSpec, make_sphere_spec


def _wp_select(wps: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """waypoints[..., idx, :] as a one-hot contraction.

    Deliberately NOT a gather: the axon TPU backend miscompiles the
    small-shape `take_along_axis` lowering under some fusion contexts
    (observed live: waypoints[2] -> [0.5, 0, 0] with trailing lanes zeroed,
    which silently corrupted every arrival check and desired velocity in
    round-2 training — see RESULTS.md "TPU backend gather bug"). A one-hot
    matmul is fusion-robust and maps to the MXU/VPU instead of a gather.
    wps: [..., W, 3]; idx: [...] int -> [..., 3]."""
    oh = jax.nn.one_hot(idx, wps.shape[-2], dtype=wps.dtype)
    # broadcast-multiply + sum, NOT einsum: the batched dot_general form
    # (batch dims [..., w] x [..., w, c]) intermittently deadlocks XLA:CPU's
    # in-process collective rendezvous on the virtual 8-device test mesh;
    # the elementwise form fuses cleanly on both backends.
    return jnp.sum(oh[..., None] * wps, axis=-2)


class WorldSpec(NamedTuple):
    """Static per-world data, padded to fixed shapes.

    Mirrors the artifact schema world_N/data_1.json
    (reference: path_planning_main.py:199, env_base.load_data env_base.py:26-47).
    Occupancy grids (E3d/E3d_safe) are intentionally NOT part of the on-device
    spec: the reference never consults them during training steps (the
    argument-shift quirk in env_base.py:142 passes garbage in their place and
    the line-of-sight check is commented out, drone.py:125). They remain
    host-side artifacts used by the offline planner (worlds/gen/).
    """

    waypoints: jnp.ndarray      # [N, W, 3] padded by repeating the last waypoint
    n_points: jnp.ndarray       # [N] int32: true number of waypoints per drone
    route_len: jnp.ndarray      # [N] precomputed polyline length
    buildings: jnp.ndarray      # [B, 4] (x, y, h, r), zero-padded
    building_mask: jnp.ndarray  # [B] bool
    map_size: jnp.ndarray       # [3]
    radius: jnp.ndarray         # [N]
    priority: jnp.ndarray       # [N]
    vel_max: jnp.ndarray        # [N, 3]
    spheres: Optional[SphereSpec] = None  # dynamic sphere obstacles (env/obstacles.py)

    @property
    def num_drones(self) -> int:
        return self.waypoints.shape[0]

    @property
    def sphere_count(self) -> int:
        return 0 if self.spheres is None else self.spheres.count

    @property
    def starts(self) -> jnp.ndarray:
        return self.waypoints[:, 0, :]

    @property
    def destinations(self) -> jnp.ndarray:
        # destination = waypoints[n_points-1] (drone.py:26 via env_drones.py:34-41);
        # padding repeats the last true waypoint so index -1 is also valid.
        return _wp_select(self.waypoints, self.n_points - 1)


class DroneState(NamedTuple):
    """Dynamic fleet state. All arrays have leading axis [N] ([E, N] batched).

    Field provenance (reference drone.py):
      pos/vel            :28, :21   (state is position-only, a 3-vector)
      yaw/pitch          :68-69     persistent, integrate across steps
      wp_idx             :53        `self.i`, current_des = waypoints[i]
      arrive_flag        :60
      dest_arrive_flag   :61
      collision_flag     :62        (never set in the training path; kept for
                                     API parity with collision_check)
      real_route_len     :32        accumulated travel distance
      extra_len          :33        set on destination arrival (drone.py:188)
      max_deviation      :37        running max, updated in dronestate() :260-262
      prev_pos           :54        previous_state
    """

    pos: jnp.ndarray            # [N, 3]
    vel: jnp.ndarray            # [N, 3]
    yaw: jnp.ndarray            # [N] degrees
    pitch: jnp.ndarray          # [N] degrees
    wp_idx: jnp.ndarray         # [N] int32
    arrive_flag: jnp.ndarray    # [N] bool
    dest_arrive_flag: jnp.ndarray  # [N] bool
    collision_flag: jnp.ndarray    # [N] bool
    real_route_len: jnp.ndarray    # [N]
    extra_len: jnp.ndarray         # [N]
    max_deviation: jnp.ndarray     # [N]
    prev_pos: jnp.ndarray          # [N, 3]
    sphere_pos: jnp.ndarray        # [S, 3] dynamic sphere obstacle positions
    sphere_vel: jnp.ndarray        # [S, 3]

    def current_des(self, world: WorldSpec) -> jnp.ndarray:
        """waypoints[i] — the active target waypoint."""
        wps = world.waypoints
        if self.pos.ndim == 3:  # batched [E, N, ...]
            wps = jnp.broadcast_to(wps, (self.pos.shape[0],) + wps.shape)
        return _wp_select(wps, self.wp_idx)

    def previous_des(self, world: WorldSpec) -> jnp.ndarray:
        """waypoints[i-1] — segment start for deviation tracking."""
        wps = world.waypoints
        if self.pos.ndim == 3:
            wps = jnp.broadcast_to(wps, (self.pos.shape[0],) + wps.shape)
        return _wp_select(wps, jnp.maximum(self.wp_idx - 1, 0))


class StepOutput(NamedTuple):
    """Per-step env outputs (leading axes match the state batch)."""

    obs_self: jnp.ndarray       # [N, 12] proprioceptive block
    obs_nbr: jnp.ndarray        # [N, nm, 9] VO neighbor blocks (urgency-ascending,
                                #            valid slots at the END of the axis)
    obs_mask: jnp.ndarray       # [N, nm] bool validity (k==0 keeps the reference's
                                #          single zero row via the encoder rule)
    reward: jnp.ndarray         # [N] rvo_reward + mov_reward (mdin.py:28)
    done: jnp.ndarray           # [N] bool: collision (ir_gym.py:248)
    info_arrive: jnp.ndarray    # [N] bool: arrive_flag (ir_gym.py:249)
    finish: jnp.ndarray         # [N] bool: destination arrived (ir_gym.py:250)


def init_drone_state(world: WorldSpec, dtype=jnp.float32) -> DroneState:
    """Fleet state after reset (drone.reset, drone.py:270-291)."""
    n = world.num_drones
    starts = world.waypoints[:, 0, :].astype(dtype)
    z = jnp.zeros((n,), dtype)
    s = world.sphere_count
    if s:
        sp = world.spheres.init[:, 0:3].astype(dtype)
        sv = world.spheres.init[:, 3:6].astype(dtype)
    else:
        sp = jnp.zeros((0, 3), dtype)
        sv = jnp.zeros((0, 3), dtype)
    return DroneState(
        pos=starts,
        vel=jnp.zeros((n, 3), dtype),
        yaw=z,
        pitch=z,
        wp_idx=jnp.ones((n,), jnp.int32),
        arrive_flag=jnp.zeros((n,), bool),
        dest_arrive_flag=jnp.zeros((n,), bool),
        collision_flag=jnp.zeros((n,), bool),
        real_route_len=z,
        extra_len=z,
        max_deviation=z,
        prev_pos=starts,
        sphere_pos=sp,
        sphere_vel=sv,
    )


def make_world_spec(
    waypoints_list,
    building_list,
    map_size,
    *,
    radius: float = 0.2,
    priority: float = 5.0,
    vel_max: float = 1.0,
    pad_waypoints: int | None = None,
    pad_buildings: int | None = None,
    spheres=None,
    dtype=np.float32,
) -> WorldSpec:
    """Build a padded WorldSpec from the data_1.json schema lists.
    `spheres`: optional list of sphere-obstacle dicts (see
    obstacles.make_sphere_spec) or a prebuilt SphereSpec."""
    n = len(waypoints_list)
    n_points = np.array([len(w) for w in waypoints_list], np.int32)
    w_max = int(pad_waypoints or max(2, n_points.max()))
    wps = np.zeros((n, w_max, 3), dtype)
    for i, w in enumerate(waypoints_list):
        w = np.asarray(w, dtype)
        wps[i, : len(w)] = w
        wps[i, len(w):] = w[-1]  # pad by repeating the final waypoint
    # route length on host in float64 then cast — matches the reference's
    # float64 accumulation at construction time (drone.py:31)
    route_len = np.zeros((n,), np.float64)
    for i, w in enumerate(waypoints_list):
        w = np.asarray(w, np.float64)
        route_len[i] = np.sqrt(((w[1:] - w[:-1]) ** 2).sum(-1)).sum()

    b = len(building_list)
    b_max = int(pad_buildings if pad_buildings is not None else max(1, b))
    buildings = np.zeros((b_max, 4), dtype)
    bmask = np.zeros((b_max,), bool)
    for i, bd in enumerate(building_list):
        buildings[i] = np.asarray(bd, dtype)
        bmask[i] = True

    if spheres is not None and not isinstance(spheres, SphereSpec):
        spheres = make_sphere_spec(spheres, priority=priority, dtype=dtype)

    return WorldSpec(
        waypoints=jnp.asarray(wps),
        n_points=jnp.asarray(n_points),
        route_len=jnp.asarray(route_len.astype(dtype)),
        buildings=jnp.asarray(buildings),
        building_mask=jnp.asarray(bmask),
        map_size=jnp.asarray(np.asarray(map_size, dtype)),
        radius=jnp.full((n,), radius, dtype),
        priority=jnp.full((n,), priority, dtype),
        vel_max=jnp.full((n, 3), vel_max, dtype),
        spheres=spheres,
    )
