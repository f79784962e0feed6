"""Sweep the RVO expert's margin x slowdown under INJECTED CONTROL NOISE.

Round-4 finding (RESULTS.md): the noise robustness of the final policy
lives in the BC clone's expert margin, not in noise fine-tuning (world_3
went 55 % -> 94 % noisy purely by cloning a margin-1.0 expert). This sweep
measures, per world, the expert's own success under the eval noise
(drone.py:79-82 semantics, std 0.06, 100 distinct episodes) across the
margin/slowdown grid — the upper bound a clone can inherit, and the lever
VERDICT r4 item 2 asks to sweep on world_4 / world_8 / world32_mix.

CPU-friendly (forces the CPU backend like tests/conftest.py).

Usage: python scripts/expert_noise_sweep.py [out.json]
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env.env import reset, step
from rvo3d_tpu.env.rvo_policy import rvo_controller
from rvo3d_tpu.worlds import load_world

MAX_EP_LEN = 150
LANES = 100  # 100 distinct noisy episodes, one per lane


def noisy_episode(world, p, slowdown, margin, key):
    """One noisy episode; margin is TRACED (one compile per world x
    slowdown). Returns (success, ep_len, collided)."""
    s0 = reset(world, p)

    def body(c, k):
        state, t, ended, success, collided = c
        a = rvo_controller(state, world, p, margin=margin,
                           slowdown=slowdown)
        state, out = step(world, state, a, p, noise_key=k)
        col = jnp.any(out.done)
        fin = jnp.all(out.finish)
        t = jnp.where(ended, t, t + 1)
        return (state, t, ended | col | fin,
                success | ((~ended) & fin),
                collided | ((~ended) & col)), None

    (state, t, ended, success, collided), _ = jax.lax.scan(
        body,
        (s0, jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
         jnp.bool_(False)),
        jax.random.split(key, MAX_EP_LEN))
    return success, t, collided


def sweep_world(wname: str, margins, reverse=False):
    wd = load_world(wname)
    world = wd.spec()
    if reverse:
        from rvo3d_tpu.worlds.multi import reverse_routes

        world = reverse_routes(world)
    p = dataclasses.replace(EnvParams(num_drones=wd.drone_num),
                            noise=True, control_std=0.06)
    rows = []
    for slowdown in (False, True):
        fn = jax.jit(jax.vmap(
            functools.partial(noisy_episode, world, p, slowdown),
            in_axes=(None, 0)))
        for m in margins:
            t0 = time.time()
            keys = jax.random.split(jax.random.PRNGKey(17), LANES)
            s, t, c = fn(jnp.float32(m), keys)
            s = np.asarray(s)
            ok_len = np.asarray(t)[s]
            row = {
                "world": wname + (":rev" if reverse else ""),
                "margin": float(m),
                "slowdown": bool(slowdown),
                "noisy_success": round(float(s.mean()), 3),
                "mean_ep_len": (round(float(ok_len.mean()), 1)
                                if s.any() else None),
                "collide_rate": round(float(np.asarray(c).mean()), 3),
            }
            rows.append(row)
            print(f"{row['world']:16s} m={m:<4} slow={int(slowdown)} "
                  f"-> noisy {row['noisy_success']:.0%} "
                  f"len {row['mean_ep_len']} col {row['collide_rate']:.0%} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return rows


def main() -> int:
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "runs/bc_evals/expert_noise_sweep.json")
    plan = [
        ("world_4", [0.3, 0.6, 0.8, 1.0, 1.2], False),
        ("world_8", [0.3, 0.45, 0.55, 0.65, 0.8], False),
        ("world32_mix", [0.0, 0.1, 0.2, 0.3, 0.45], False),
        ("world32_mix", [0.0, 0.1, 0.2, 0.3, 0.45], True),
        ("world_3", [0.8, 1.0, 1.2], False),
        ("world16_dense", [0.0, 0.1, 0.2, 0.3], False),
    ]
    all_rows = []
    for wname, margins, rev in plan:
        all_rows.extend(sweep_world(wname, margins, reverse=rev))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"lanes": LANES, "max_ep_len": MAX_EP_LEN,
                   "control_std": 0.06, "rows": all_rows}, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
