"""The vectorized drone environment: pure-functional reset/step/observe.

One jitted step implements the exact per-step pipeline of the reference's
mdin.drone_step (mdin.py:19-30):

  1. RVO shaping reward on PRE-step states   (ir_gym.rvo_reward_list_cal)
  2. kinematics + integration + waypoint advance  (env_base.drone_step ->
     drone.move_forward, with the effective `stop`-freeze quirk)
  3. observation + movement reward on POST-step states
     (ir_gym.obs_move_reward_list -> observation_reward)
  4. reward = rvo + mov                      (mdin.py:28)

Agents are an array axis (no per-agent Python loops); env instances are a
second axis added by vmap. Everything is static-shape and jit-safe.
"""

from __future__ import annotations


from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env import geometry as geo
from rvo3d_tpu.env.reward import mov_reward, rvo_reward
from rvo3d_tpu.env.rvo import vo_observe
from rvo3d_tpu.env.state import DroneState, StepOutput, WorldSpec, init_drone_state


def drone_states_12(world: WorldSpec, state: DroneState,
                    p: EnvParams) -> Tuple[jnp.ndarray, DroneState]:
    """The 12-D per-drone state vector [pos, vel, radius, priority, des_vel,
    deviation] (reference: drone.dronestate, drone.py:254-263). Computing it
    updates the running max_deviation exactly like the reference's side
    effect (drone.py:260-262). Returns (states [N,12], updated state)."""
    cur_des = state.current_des(world)
    prev_des = state.previous_des(world)
    des_vel = geo.desired_velocity(
        state.pos, cur_des, world.vel_max, p.goal_threshold,
        parity_round=p.parity_rounding,
    )
    dev = geo.point_line_deviation(prev_des, cur_des, state.pos)
    states = jnp.concatenate(
        [
            state.pos,
            state.vel,
            world.radius[:, None],
            world.priority[:, None],
            des_vel,
            dev[:, None],
        ],
        axis=-1,
    )
    state = state._replace(
        max_deviation=jnp.maximum(state.max_deviation, dev)
    )
    return states, state


def reset(world: WorldSpec, p: EnvParams, dtype=jnp.float32) -> DroneState:
    """Full fleet reset (reference: env_drone.drones_reset via ir_gym.env_reset,
    ir_gym.py:360-367)."""
    del p
    return init_drone_state(world, dtype)


def reset_where(world: WorldSpec, state: DroneState,
                mask: jnp.ndarray) -> DroneState:
    """Reset individual drones where mask[i] (reference: drone.reset via
    mdin.drone_reset_one, drone.py:270-291). Masked lanes take the initial
    per-drone state; others are untouched. Sphere obstacles reset only when
    EVERY drone resets (the full env reset); per-drone collision resets
    leave them flying."""
    fresh = init_drone_state(world, state.pos.dtype)

    def pick(a, b):
        m = mask
        while m.ndim < a.ndim:
            m = m[..., None]
        return jnp.where(m, a, b)

    full = jnp.all(mask)
    new = DroneState(
        pos=pick(fresh.pos, state.pos),
        vel=pick(fresh.vel, state.vel),
        yaw=pick(fresh.yaw, state.yaw),
        pitch=pick(fresh.pitch, state.pitch),
        wp_idx=pick(fresh.wp_idx, state.wp_idx),
        arrive_flag=pick(fresh.arrive_flag, state.arrive_flag),
        dest_arrive_flag=pick(fresh.dest_arrive_flag, state.dest_arrive_flag),
        collision_flag=pick(fresh.collision_flag, state.collision_flag),
        real_route_len=pick(fresh.real_route_len, state.real_route_len),
        extra_len=pick(fresh.extra_len, state.extra_len),
        max_deviation=pick(fresh.max_deviation, state.max_deviation),
        prev_pos=pick(fresh.prev_pos, state.prev_pos),
        sphere_pos=jnp.where(full, fresh.sphere_pos, state.sphere_pos),
        sphere_vel=jnp.where(full, fresh.sphere_vel, state.sphere_vel),
    )
    return new


def observe(world: WorldSpec, state: DroneState,
            p: EnvParams) -> Tuple[StepOutput, DroneState]:
    """Observation-only pass (reference: ir_gym.env_observation /
    observation, ir_gym.py:334-358, :372-383): config_vo_inf with a zero
    action, 12-D proprio block, everything rounded to 2 decimals. Reward and
    flag outputs are zeroed."""
    states12, state = drone_states_12(world, state, p)
    zero_act = jnp.zeros_like(state.vel)
    vo = vo_observe(states12, zero_act, world.buildings, world.building_mask,
                    p, others=_vo_others(world, state, states12))
    n = states12.shape[0]
    out = StepOutput(
        obs_self=geo.rnd(states12, 2, p.parity_rounding),
        obs_nbr=geo.rnd(vo.obs_nbr, 2, p.parity_rounding),
        obs_mask=vo.obs_mask,
        reward=jnp.zeros((n,), states12.dtype),
        done=jnp.zeros((n,), bool),
        info_arrive=state.arrive_flag,
        finish=state.dest_arrive_flag,
    )
    return out, state


def _vo_others(world: WorldSpec, state: DroneState,
               states12: jnp.ndarray) -> jnp.ndarray | None:
    """The 'others' block for the VO engine: the drones themselves plus any
    dynamic sphere obstacles (env/obstacles.py) as extra participants."""
    if world.sphere_count == 0:
        return None
    from rvo3d_tpu.env.obstacles import sphere_states8

    sph = sphere_states8(state.sphere_pos, state.sphere_vel, world.spheres)
    return jnp.concatenate([states12[:, 0:8], sph.astype(states12.dtype)], 0)


def step(world: WorldSpec, state: DroneState, abs_action: jnp.ndarray,
         p: EnvParams, noise_key: jax.Array | None = None
         ) -> Tuple[DroneState, StepOutput]:
    """One environment step for the whole fleet.

    abs_action [N, 3] is the absolute action (the trainer composes
    abs = acceler * a_inc + cur_vel outside, multi_ppo.py:202-205)."""
    dtype = state.pos.dtype

    # ---- 0. advance dynamic sphere obstacles (extension; obstacles move
    # first, then drones react this step) ----
    if world.sphere_count:
        from rvo3d_tpu.env.obstacles import step_spheres

        sp, sv = step_spheres(state.sphere_pos, state.sphere_vel,
                              world.spheres, world.map_size, p.dt,
                              p.goal_threshold)
        state = state._replace(sphere_pos=sp, sphere_vel=sv)

    # ---- 1. RVO shaping reward on PRE-step states (mdin.py:24) ----
    states12_pre, state = drone_states_12(world, state, p)
    r_rvo = rvo_reward(states12_pre, abs_action, p,
                       others=_vo_others(world, state, states12_pre))

    # ---- 2. physics (drone.move_forward, drone.py:96-119) ----
    new_vel, new_yaw, new_pitch, _ = geo.kinematic_step(
        state.vel, state.yaw, state.pitch, abs_action,
        p.max_acc, p.max_angle_change,
    )
    # `stop` freeze: effectively always on due to the reference's
    # argument-shift quirk (env_base.py:142 vs drone.py:96; SURVEY §3.2) —
    # arrived/collided drones hold position while yaw/pitch keep integrating.
    frozen = state.dest_arrive_flag | state.collision_flag
    new_vel = jnp.where(frozen[:, None], 0.0, new_vel)

    if p.noise:
        assert noise_key is not None
        noise = jax.random.normal(noise_key, new_vel.shape, dtype) * p.control_std
        # the reference perturbs the POSITION update only: motion() rounds
        # vel+noise for next_state while move() stores the CLEAN vel
        # (drone.py:150-151, :163-169)
        vel_eff = geo.rnd(new_vel + noise, 2, True)
    else:
        vel_eff = new_vel

    new_pos = state.pos + vel_eff * p.dt
    real_route_len = state.real_route_len + geo.norm3(new_pos - state.pos)

    # ---- waypoint advance (drone.py:116-130) ----
    cur_des = state.current_des(world)
    dest = world.destinations.astype(dtype)
    arrived_wp = geo.norm3(new_pos - cur_des) <= p.goal_threshold
    at_dest = geo.norm3(new_pos - dest) <= p.goal_threshold
    # destination_arrive() side effect (drone.py:188): refresh extra_len.
    # Python short-circuit: destination_arrive is only evaluated when the
    # waypoint-arrive check passed (drone.py:116).
    extra_len = jnp.where(
        arrived_wp & at_dest, real_route_len - world.route_len, state.extra_len
    )
    can_advance = arrived_wp & (~at_dest) & (state.wp_idx < world.n_points - 1)
    new_wp_idx = jnp.where(can_advance, state.wp_idx + 1, state.wp_idx)
    arrive_flag = jnp.where(can_advance, False, state.arrive_flag)

    state = state._replace(
        pos=new_pos, vel=new_vel, yaw=new_yaw, pitch=new_pitch,
        wp_idx=new_wp_idx, arrive_flag=arrive_flag,
        real_route_len=real_route_len, extra_len=extra_len,
        prev_pos=state.pos,
    )

    # ---- 3. post-step observation + movement reward (ir_gym.py:156-254) ----
    states12_post, state = drone_states_12(world, state, p)

    cur_des2 = state.current_des(world)
    arrived_now = geo.norm3(new_pos - cur_des2) <= p.goal_threshold
    arrive_reward_flag = arrived_now & (~state.arrive_flag)
    arrive_flag = state.arrive_flag | arrived_now
    # destination check gated on arrive_flag (ir_gym.py:175-181)
    dest_now = arrive_flag & at_dest
    dest_reward_flag = dest_now & (~state.dest_arrive_flag)
    dest_arrive_flag = state.dest_arrive_flag | dest_now
    extra_len = jnp.where(
        dest_now, real_route_len - world.route_len, state.extra_len
    )
    state = state._replace(
        arrive_flag=arrive_flag, dest_arrive_flag=dest_arrive_flag,
        extra_len=extra_len,
    )

    vo = vo_observe(
        states12_post, abs_action, world.buildings, world.building_mask, p,
        others=_vo_others(world, state, states12_post),
    )
    collision = vo.collision | geo.out_of_map(new_pos, world.map_size)

    exlen = real_route_len - world.route_len + 4.0
    r_mov = mov_reward(
        collision=collision,
        arrive_reward_flag=arrive_reward_flag,
        waypoint_num=new_wp_idx,
        n_points_m1=world.n_points - 1,
        dest_arrive_reward_flag=dest_reward_flag,
        deviation=states12_post[:, 11],
        exlen_pos=exlen > 0.0,
        exlen=exlen,
        p=p,
    )
    if p.mov_p_progress:
        # opt-in progress shaping (see EnvParams.mov_p_progress): distance
        # gained this step toward the waypoint that was active during it
        progress = geo.norm3(state.prev_pos - cur_des) - geo.norm3(
            new_pos - cur_des)
        r_mov = r_mov + jnp.where(
            collision, 0.0, p.mov_p_progress * progress)

    out = StepOutput(
        obs_self=geo.rnd(states12_post, 2, p.parity_rounding),
        obs_nbr=geo.rnd(vo.obs_nbr, 2, p.parity_rounding),
        obs_mask=vo.obs_mask,
        reward=r_rvo + r_mov,
        done=collision,
        info_arrive=arrive_flag,
        finish=dest_arrive_flag,
    )
    return state, out


class DroneEnv:
    """Thin convenience wrapper binding (world, params) with vmapped,
    jitted entry points over an env-instance batch axis E.

    Replaces the reference's `gym.make('mdin-v1')` facade (mdin.py:6-49)
    with explicit constructors — the reference env id was registered
    out-of-tree and unresolvable (SURVEY §1)."""

    def __init__(self, world: WorldSpec, params: EnvParams, num_envs: int = 1,
                 dtype=jnp.float32):
        self.world = world
        self.params = params
        self.num_envs = num_envs
        self.dtype = dtype

    # ---- single-env (unbatched) API ----
    def reset1(self) -> Tuple[DroneState, StepOutput]:
        s = reset(self.world, self.params, self.dtype)
        out, s = observe(self.world, s, self.params)
        return s, out

    def step1(self, state, abs_action):
        return step(self.world, state, abs_action, self.params)

    # ---- batched API: leading axis [E] ----
    def reset_batch(self) -> Tuple[DroneState, StepOutput]:
        s = reset(self.world, self.params, self.dtype)
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.num_envs,) + x.shape), s
        )
        out, batched = jax.vmap(
            lambda st: observe(self.world, st, self.params)
        )(batched)
        return batched, out

    def step_batch(self, state, abs_action):
        """state: [E, N, ...]; abs_action: [E, N, 3]."""
        return jax.vmap(lambda st, a: step(self.world, st, a, self.params))(
            state, abs_action
        )

    def observe_batch(self, state):
        return jax.vmap(lambda st: observe(self.world, st, self.params))(state)

    def reset_where_batch(self, state, mask):
        """mask: [E, N] bool."""
        return jax.vmap(lambda st, m: reset_where(self.world, st, m))(
            state, mask
        )

    def obs_flat(self, out: StepOutput) -> jnp.ndarray:
        """Flatten (self, neighbors) into the reference's concatenated layout
        [..., 12 + 9*nm] (padding zeros where the reference list was short)."""
        lead = out.obs_self.shape[:-1]
        nbr = out.obs_nbr.reshape(lead + (-1,))
        return jnp.concatenate([out.obs_self, nbr], axis=-1)
