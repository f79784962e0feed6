"""Benchmark: vectorized env stepping throughput on the flagship scenario.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aggregate env-steps/s (one env-step = one step of one env instance
with all N drones) on this process's devices, stepping the 8-drone flagship
world with an on-device analytic controller (so drones genuinely fly,
interact, collide, and reset — the full step pipeline including all-pairs
VO observation assembly and per-drone lifecycle).

Baseline: the same scenario stepped by the NumPy oracle — a faithful
single-process re-expression of the reference implementation (which is
itself pure single-process Python; SURVEY §6 — the reference publishes no
numbers, so its own execution model is the baseline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_jax(world_dict, num_envs: int, steps: int, repeats: int = 3):
    import jax
    import jax.numpy as jnp

    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env import geometry as geo
    from rvo3d_tpu.env.env import observe, reset, reset_where, step
    from rvo3d_tpu.env.state import make_world_spec

    world = make_world_spec(
        world_dict["waypoints_list"], world_dict["building_list"],
        world_dict["map_size"],
    )
    p = EnvParams(num_drones=world_dict["drone_num"])

    def controller(state):
        """Analytic waypoint-tracking controller in pure jnp."""
        cur_des = state.current_des(world)
        dif = cur_des - state.pos
        dist = geo.norm3(dif)
        t_yaw = jnp.degrees(jnp.arctan2(dif[..., 1], dif[..., 0])) % 360.0
        horiz = jnp.sqrt(dif[..., 0] ** 2 + dif[..., 1] ** 2)
        t_pitch = jnp.degrees(jnp.arctan2(dif[..., 2], horiz))
        dyaw = ((t_yaw - state.yaw + 180.0) % 360.0) - 180.0
        dpitch = t_pitch - state.pitch
        speed = geo.norm3(state.vel)
        acc = jnp.clip(jnp.minimum(0.8, dist) - speed, -1, 1)
        return jnp.stack(
            [acc, jnp.clip(dyaw / 90.0, -1, 1), jnp.clip(dpitch / 90.0, -1, 1)],
            axis=-1,
        )

    def one_step(state, _):
        act = controller(state)
        state, out = step(world, state, act, p)
        # trainer-style lifecycle: reset collided or finished drones
        state = reset_where(world, state, out.done | out.finish)
        return state, None

    def run_chunk(state):
        state, _ = jax.lax.scan(one_step, state, None, length=steps)
        return state

    run = jax.jit(jax.vmap(run_chunk))

    s0 = reset(world, p)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape).copy(), s0
    )

    state = run(state)  # compile + warm up
    jax.block_until_ready(state)

    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = run(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        rates.append(num_envs * steps / dt)
    return max(rates), rates


def bench_oracle(world_dict, steps: int = 60):
    """Single-process reference-model baseline."""
    from rvo3d_tpu.env.oracle import OracleEnv
    from rvo3d_tpu.worlds.loader import WorldData

    wd = WorldData(
        name="flagship", drone_num=world_dict["drone_num"],
        map_size=world_dict["map_size"],
        waypoints_list=world_dict["waypoints_list"],
        n_points_list=world_dict["n_points_list"],
        building_list=world_dict["building_list"],
    )
    env = OracleEnv(wd)
    env.reset()
    n = wd.drone_num
    t0 = time.perf_counter()
    for t in range(steps):
        acts = [d.cal_des_vel() for d in env.drones]
        _, _, done, _, fin = env.step(acts)
        for i in range(n):
            if done[i] or fin[i]:
                env.reset_one(i)
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    world_dict_src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "__graft_entry__.py")
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", world_dict_src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    world_dict = mod._flagship_world()

    num_envs = int(os.environ.get("RVO3D_BENCH_ENVS", "16384"))
    steps = int(os.environ.get("RVO3D_BENCH_STEPS", "100"))
    repeats = int(os.environ.get("RVO3D_BENCH_REPEATS", "3"))

    value, rates = bench_jax(world_dict, num_envs, steps, repeats)
    baseline = bench_oracle(world_dict)

    # per-repeat spread in the SAME line (extra keys; schema keys intact):
    # the tunneled-chip run-to-run variance is real — BENCH_r03 vs r04
    # differed 17 % on identical env code — so a single best-of number
    # without spread can masquerade as a regression (VERDICT r4 item 4)
    rates_sorted = sorted(rates)
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(value, 1),
        "unit": "env-steps/s (8-drone flagship world, full step pipeline)",
        "vs_baseline": round(value / baseline, 1),
        "repeats": len(rates),
        "min": round(rates_sorted[0], 1),
        "median": round(rates_sorted[len(rates_sorted) // 2], 1),
        "max": round(rates_sorted[-1], 1),
    }))


if __name__ == "__main__":
    main()
