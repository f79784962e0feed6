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


def _boundary_margin(oracle, i: int, p) -> float:
    """Min |signed distance| of drone i's post-step oracle state to any
    episode-flag decision boundary (map edge, drone/building collision
    radius, waypoint/destination goal threshold). In noise mode velocities
    are rounded to 2 decimals (drone.py:163), so positions ride exactly on
    such boundaries and the comparison is an ulp coin-flip there — those
    steps are knife-edge ties, not semantic mismatches."""
    d = oracle.drones[i]
    pos = np.asarray(d.state, float)
    m = min(abs(float(c)) for c in pos)
    m = min(m, min(abs(float(ms - c)) for ms, c in zip(oracle.map_size, pos)))
    for j, o in enumerate(oracle.drones):
        if j == i:
            continue
        dis = float(np.linalg.norm(pos - np.asarray(o.state, float)))
        m = min(m, abs(dis - (d.radius + o.radius)))
    for b in oracle.building_list:
        # gate each term on the complementary half of the collision
        # predicate (check_col_with_budilding: dis2d <= r+R AND z <= h):
        # the radial boundary only decides when the drone is under the
        # roof, the height boundary only when inside the cylinder's xy
        # footprint — otherwise a coincidental match (e.g. cruising exactly
        # at a building's height across the map) would misclassify a real
        # flag mismatch as a knife-edge tie.
        dis2d = float(np.linalg.norm(pos[:2] - np.asarray(b[:2], float)))
        r_sum = float(b[3]) + d.radius
        if pos[2] <= float(b[2]):
            m = min(m, abs(dis2d - r_sum))
        if dis2d <= r_sum:
            m = min(m, abs(float(b[2]) - pos[2]))
        if pos[2] > float(b[2]) and dis2d > r_sum:
            # top-rim corner: neither gate admits its boundary term, yet a
            # drone can sit on a knife edge exactly at the rim circle
            # (radially outside AND above the roof) — distance to the rim
            # (ADVICE r3) keeps a genuine tie there from being classified
            # as a real flag mismatch.
            m = min(m, float(np.hypot(dis2d - r_sum, pos[2] - float(b[2]))))
    m = min(m, abs(float(np.linalg.norm(pos - d.current_des)) - d.goal_threshold))
    m = min(m, abs(float(np.linalg.norm(pos - d.destination)) - d.goal_threshold))
    return m


def run_parity(worlds: List[str], steps: int = 200, x64: bool = False,
               seed: int = 7, env_train: bool = True,
               noise: bool = False) -> int:
    """env_train=False exercises the eval-mode collision branch
    (exp_radius shrink, rvo_inter.py:139-150). noise=True injects the SAME
    pre-drawn control-noise samples into both implementations (the
    reference's drone.py:163 noise path), keeping the comparison exact."""
    import jax

    # ORDER MATTERS, and the platform update must be UNCONDITIONAL: an
    # explicit jax_platforms update (vs inheriting JAX_PLATFORMS=cpu) puts
    # XLA:CPU on codegen that matches NumPy op-for-op (~9e-16 trajectory
    # error over 200 steps); without it the jitted step drifts ~2e-13 —
    # enough to flip a collision flag at a rounded-position distance
    # boundary in noise mode. x64 likewise must precede backend init.
    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env.env import reset, reset_where, step
    from rvo3d_tpu.env.oracle import OracleEnv
    from rvo3d_tpu.worlds import load_world

    dtype = jnp.float64 if x64 else jnp.float32
    overall_ok = True
    mode = ("train" if env_train else "eval") + ("+noise" if noise else "")

    for world_name in worlds:
        wd = load_world(world_name)
        p = EnvParams(num_drones=wd.drone_num, env_train=env_train,
                      noise=noise)
        spec = wd.spec(dtype=np.float64 if x64 else np.float32)
        oracle = OracleEnv(wd, env_train=env_train)
        oracle.reset()
        state = reset(spec, p, dtype)
        jstep = jax.jit(lambda s, a, k: step(spec, s, a, p, noise_key=k))

        rng = np.random.default_rng(seed)
        n = wd.drone_num
        max_pos = max_rew = 0.0
        flags_ok = True
        episodes = 0
        ties = 0

        nkey = jax.random.PRNGKey(seed + 101)
        for t in range(steps):
            des = np.stack([d.cal_des_vel() for d in oracle.drones])
            acts = np.round(des + 0.3 * rng.standard_normal((n, 3)), 2)

            nkey, k = jax.random.split(nkey)
            nvals = (np.asarray(jax.random.normal(k, (n, 3), dtype))
                     * p.control_std if noise else None)
            _, o_rew, o_done, o_info, o_fin = oracle.step(acts, nvals)
            state, out = jstep(state, jnp.asarray(acts, dtype), k)

            pos_err_i = np.max(np.abs(
                np.asarray(state.pos) -
                np.stack([d.state for d in oracle.drones])), axis=-1)  # [N]
            j_rew = np.asarray(out.reward)
            both_fin = np.isfinite(np.asarray(o_rew)) & np.isfinite(j_rew)
            rew_err_i = np.where(both_fin,
                                 np.abs(np.asarray(o_rew) - j_rew), 0.0)
            jd = list(np.asarray(out.done))
            jf = list(np.asarray(out.finish))
            ji = list(np.asarray(out.info_arrive))
            disagree = [i for i in range(n)
                        if jd[i] != o_done[i] or jf[i] != o_fin[i]
                        or ji[i] != o_info[i]]
            if disagree and all(_boundary_margin(oracle, i, p) < 1e-9
                                for i in disagree):
                # knife-edge tie: both implementations sit on a decision
                # boundary to within float noise. Reset the tied drones in
                # BOTH so lockstep comparison continues. Only the TIED
                # drones leave this step's error accounting — a genuine
                # pos/reward divergence on any other drone still counts.
                ties += 1
                mask = np.zeros(n, bool)
                mask[disagree] = True
                max_pos = max(max_pos, float(np.max(
                    np.where(mask, 0.0, pos_err_i), initial=0.0)))
                max_rew = max(max_rew, float(np.max(
                    np.where(mask, 0.0, rew_err_i), initial=0.0)))
                for i in disagree:
                    oracle.reset_one(i)
                state = reset_where(spec, state, jnp.asarray(mask))
                o_done = [d and not m for d, m in zip(o_done, mask)]
            else:
                max_pos = max(max_pos, float(np.max(pos_err_i)))
                max_rew = max(max_rew, float(np.max(rew_err_i)))
                flags_ok &= not disagree

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
        tie_note = f", {ties} knife-edge tie(s)" if ties else ""
        print(f"[{status}] {world_name} [{mode}]: {steps} steps, "
              f"{episodes} episode boundaries, max |pos err|={max_pos:.3e}, "
              f"max |reward err|={max_rew:.3e}, flags "
              f"{'exact' if flags_ok else 'MISMATCH'}{tie_note} "
              f"({'x64' if x64 else 'f32'})")

    return 0 if overall_ok else 1


if __name__ == "__main__":
    sys.exit(run_parity(["world_2", "world_2_cross", "world_3", "world_4", "world_8"],
                        x64="--x64" in sys.argv))
