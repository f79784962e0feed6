"""Environment smoke script — the working equivalent of the reference's
uaisa_env/gym_env_test.py (which feeds desired-velocity VECTORS into the
kinematic action space, so its drones barely move; SURVEY §4).

Drives world_3 for 300 steps with the analytic waypoint controller,
resetting drones on collision/arrival, and prints a running summary.

  JAX_PLATFORMS=cpu python examples/env_smoke.py [world_name]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax


def main():
    world_name = sys.argv[1] if len(sys.argv) > 1 else "world_3"

    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env import DroneEnv
    from rvo3d_tpu.env.env import reset_where
    from rvo3d_tpu.utils import waypoint_controller
    from rvo3d_tpu.worlds import load_world

    wd = load_world(world_name)
    env = DroneEnv(wd.spec(), EnvParams(num_drones=wd.drone_num))
    state, out = env.reset1()

    collisions = finishes = 0
    jstep = jax.jit(env.step1)
    for t in range(300):
        a = waypoint_controller(state, env.world)
        state, out = jstep(state, a)
        if bool(out.done.any()):
            collisions += int(np.asarray(out.done).sum())
            state = reset_where(env.world, state, out.done)
        if bool(out.finish.any()):
            finishes += int(np.asarray(out.finish).sum())
            state = reset_where(env.world, state, out.finish)
        if t % 50 == 0:
            print(f"t={t:3d} pos[0]={np.asarray(state.pos[0]).round(2)} "
                  f"reward={np.asarray(out.reward).round(2)}")
    print(f"done: {collisions} collision resets, {finishes} arrivals "
          f"over 300 steps on {world_name} ({wd.drone_num} drones)")


if __name__ == "__main__":
    main()
