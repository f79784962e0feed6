"""Config-ladder rungs 4-5 benchmark (BASELINE.json configs[3], configs[4]):

  rung 4: world16_dense  — 16-drone dense conflict, 8k env lanes, one chip
  rung 5: world32_mix    — 32-drone multi-scenario stacked batch
          (worlds/multi.py mixes world32_mix with world16_dense lanes; the
          N>=2-host sharded-learner variant is exercised by
          tests/test_multihost.py + dryrun_multichip — one physical chip
          here, so the aggregate number is per-chip)

Env-only stepping with the on-device analytic controller (same protocol as
bench.py). Writes ladder_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp


def main():
    from bench import bench_jax

    from rvo3d_tpu.worlds import load_world

    results = {"device": str(jax.devices()[0])}

    # rung 4: 16-drone dense, 8k lanes
    wd16 = load_world("world16_dense")
    w16 = {"waypoints_list": wd16.waypoints_list,
           "building_list": wd16.building_list,
           "map_size": wd16.map_size, "drone_num": wd16.drone_num}
    r16 = bench_jax(w16, 8192, steps=60, repeats=2)
    results["world16_dense_E8192_env_steps_per_sec"] = round(r16, 1)
    print(f"world16_dense E=8192: {r16:,.0f} env-steps/s", flush=True)

    # rung 5: 32-drone multi-scenario mix — stacked per-lane worlds
    import numpy as np

    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env import geometry as geo
    from rvo3d_tpu.env.env import observe, reset, reset_where, step
    from rvo3d_tpu.worlds.multi import stack_worlds, worlds_for_lanes

    wd32 = load_world("world32_mix")
    spec32 = wd32.spec()
    E = 2048
    # a genuine MIX: pad the 16-drone world to the 32-slot shape is not
    # meaningful (different N); the mix here is world32_mix route-subset
    # variants — alternate lanes start from reversed waypoint routes,
    # giving two scenario populations in one stacked batch.
    rev = spec32._replace(waypoints=spec32.waypoints[:, ::-1, :])
    stacked = stack_worlds([spec32, rev])
    lanes = worlds_for_lanes(stacked, np.arange(E) % 2)
    p = EnvParams(num_drones=wd32.drone_num)

    def controller(world, state):
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
        return jnp.stack([acc, jnp.clip(dyaw / 90.0, -1, 1),
                          jnp.clip(dpitch / 90.0, -1, 1)], axis=-1)

    def chunk(state, T=60):
        def body(st, _):
            a = jax.vmap(controller)(lanes, st)
            st, o = jax.vmap(lambda w, s, aa: step(w, s, aa, p))(lanes, st, a)
            st = jax.vmap(reset_where)(lanes, st, o.done | o.finish)
            return st, None

        st, _ = jax.lax.scan(body, state, None, length=T)
        return st

    state = jax.vmap(lambda w: reset(w, p))(lanes)
    run = jax.jit(chunk)
    out = run(state)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)
    r32 = E * 60 / best
    results["world32_mix_E2048_env_steps_per_sec"] = round(r32, 1)
    print(f"world32_mix (2-scenario stacked) E=2048: {r32:,.0f} env-steps/s",
          flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ladder_bench.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
