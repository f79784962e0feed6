"""Standalone fixed-seed parity harness: JAX env vs the NumPy oracle.

The north-star check (BASELINE.md): identical trajectories, rewards,
observations, and episode flags under a scripted action sequence. With
--x64 the JAX env runs in float64 like the oracle, making the comparison
bit-level tight (float32 mode reports max deviations against tolerance).

Run in a fresh process (x64 is a process-global JAX setting):
  JAX_PLATFORMS=cpu python -m rvo3d_tpu.cli parity --x64
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np


def run_parity(worlds: List[str], steps: int = 200, x64: bool = False,
               seed: int = 7) -> int:
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env.env import reset, reset_where, step
    from rvo3d_tpu.env.oracle import OracleEnv
    from rvo3d_tpu.worlds import load_world

    dtype = jnp.float64 if x64 else jnp.float32
    overall_ok = True

    for world_name in worlds:
        wd = load_world(world_name)
        p = EnvParams(num_drones=wd.drone_num)
        spec = wd.spec(dtype=np.float64 if x64 else np.float32)
        oracle = OracleEnv(wd)
        oracle.reset()
        state = reset(spec, p, dtype)
        jstep = jax.jit(lambda s, a: step(spec, s, a, p))

        rng = np.random.default_rng(seed)
        n = wd.drone_num
        max_pos = max_rew = 0.0
        flags_ok = True
        episodes = 0

        for t in range(steps):
            des = np.stack([d.cal_des_vel() for d in oracle.drones])
            acts = np.round(des + 0.3 * rng.standard_normal((n, 3)), 2)

            _, o_rew, o_done, o_info, o_fin = oracle.step(acts)
            state, out = jstep(state, jnp.asarray(acts, dtype))

            pos_err = float(np.max(np.abs(
                np.asarray(state.pos) -
                np.stack([d.state for d in oracle.drones]))))
            finite = [r for r, jr in zip(o_rew, np.asarray(out.reward))
                      if np.isfinite(r) and np.isfinite(jr)]
            rew_err = float(np.max(np.abs(
                np.asarray(finite) -
                np.asarray([jr for r, jr in zip(
                    o_rew, np.asarray(out.reward))
                    if np.isfinite(r) and np.isfinite(jr)])))) \
                if finite else 0.0
            max_pos = max(max_pos, pos_err)
            max_rew = max(max_rew, rew_err)
            flags_ok &= (list(np.asarray(out.done)) == list(o_done)
                         and list(np.asarray(out.finish)) == list(o_fin)
                         and list(np.asarray(out.info_arrive)) == list(o_info))

            if any(o_done):
                mask = np.array(o_done)
                for i in range(n):
                    if mask[i]:
                        oracle.reset_one(i)
                state = reset_where(spec, state, jnp.asarray(mask))
                episodes += 1
            if all(o_fin):
                oracle.reset()
                state = reset(spec, p, dtype)
                episodes += 1

        tol = 1e-12 if x64 else 3e-5
        ok = flags_ok and max_pos <= tol and max_rew <= (tol if x64 else 6e-3)
        overall_ok &= ok
        status = "OK " if ok else "FAIL"
        print(f"[{status}] {world_name}: {steps} steps, {episodes} episode "
              f"boundaries, max |pos err|={max_pos:.3e}, "
              f"max |reward err|={max_rew:.3e}, flags "
              f"{'exact' if flags_ok else 'MISMATCH'} "
              f"({'x64' if x64 else 'f32'})")

    return 0 if overall_ok else 1


if __name__ == "__main__":
    sys.exit(run_parity(["world_2", "world_2_cross", "world_3", "world_4", "world_8"],
                        x64="--x64" in sys.argv))
