"""Evaluate the analytic experts (waypoint / RVO controllers) under the
reference's eval semantics (post_train.py:86-104: episode ends on any
collision, max_ep_len, or all-finish; success = all drones reach their
destinations). Establishes the success-rate upper bound a BC warm start can
inherit before PPO fine-tuning.

Usage: python scripts/expert_eval.py [world ...]
"""

from __future__ import annotations

import functools
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container sitecustomize imports jax pinned to the axon TPU
    # tunnel; mirror tests/conftest.py's hard override
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, ".")

from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.env.env import observe, reset, step
from rvo3d_tpu.env.rvo_policy import rvo_controller
from rvo3d_tpu.utils.heuristic import waypoint_controller


def expert_episode(world, p, controller, max_ep_len=150):
    """Run ONE episode from reset; returns (success, ep_len, collided)."""
    s0 = reset(world, p)

    def body(c, _):
        state, t, ended, success, collided = c
        a = controller(state)
        state, out = step(world, state, a, p)
        col = jnp.any(out.done)
        fin = jnp.all(out.finish)
        t = jnp.where(ended, t, t + 1)
        return (state, t,
                ended | col | fin,
                success | ((~ended) & fin),
                collided | ((~ended) & col)), None

    (state, t, ended, success, collided), _ = jax.lax.scan(
        body, (s0, jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
               jnp.bool_(False)), None, length=max_ep_len)
    return success, t, collided


def main(worlds):
    from rvo3d_tpu.worlds import load_world

    for wname in worlds:
        wd = load_world(wname)
        world = wd.spec()
        p = EnvParams(num_drones=wd.drone_num)
        for name, ctrl in [
            ("waypoint", functools.partial(waypoint_controller, world=world)),
            ("rvo", lambda st: rvo_controller(st, world, p)),
        ]:
            import time
            t0 = time.time()
            fn = jax.jit(functools.partial(expert_episode, world, p, ctrl))
            s, t, c = fn()
            print(f"{wname:14s} {name:9s} success={bool(s)} "
                  f"ep_len={int(t)} collided={bool(c)} "
                  f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["world_2", "world_3", "world_4", "world_8"])
