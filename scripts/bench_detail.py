"""Detailed performance measurement (run manually; bench.py stays the
single-line driver contract).

Measures on the current devices:
  1. env-only stepping (the bench.py metric) across env-count sweep
  2. policy-in-the-loop rollout (biGRU-256 sampling + env step)
  3. full PPO train epoch (rollout + GAE + update)
Writes bench_details.json and prints a table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    world_dict = mod._flagship_world()

    from bench import bench_jax

    from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
    from rvo3d_tpu.env.state import make_world_spec
    from rvo3d_tpu.models import ActorCritic
    from rvo3d_tpu.env.env import observe, step
    from rvo3d_tpu.env import geometry as geo

    results = {"device": str(jax.devices()[0])}

    # 1. env-only sweep
    env_sweep = {}
    for e in (2048, 4096, 8192, 16384):
        rate = bench_jax(world_dict, e, steps=60, repeats=2)
        env_sweep[str(e)] = round(rate, 1)
        print(f"env-only E={e}: {rate:,.0f} env-steps/s")
    results["env_only_steps_per_sec"] = env_sweep

    # 2. policy-in-the-loop rollout
    world = make_world_spec(world_dict["waypoints_list"],
                            world_dict["building_list"],
                            world_dict["map_size"])
    p = EnvParams(num_drones=world_dict["drone_num"])
    for use_pallas in (False, True):
        mc = ModelConfig(use_pallas_gru=use_pallas)
        ac = ActorCritic(mc)
        nm = p.neighbor_num
        params = ac.init(jax.random.PRNGKey(0), jnp.zeros((1, 12)),
                         jnp.zeros((1, nm, 9)), jnp.zeros((1, nm), bool))
        E = 2048
        from rvo3d_tpu.env.env import reset, reset_where

        s0 = reset(world, p)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (E,) + x.shape).copy(), s0)

        def chunk(state, key, T=30):
            def body(carry, _):
                st, k = carry
                k, ak = jax.random.split(k)
                out, st = jax.vmap(lambda s: observe(world, s, p))(st)
                ps = ac.apply(params, ak, out.obs_self, out.obs_nbr,
                              out.obs_mask, method=ActorCritic.step)
                a = geo.rnd(ps.action, 2, True)
                abs_a = geo.rnd(p.acceler * a + st.vel, 2, True)
                st, o = jax.vmap(lambda s, aa: step(world, s, aa, p))(st, abs_a)
                st = jax.vmap(lambda w_s, m: reset_where(world, w_s, m))(
                    st, o.done | o.finish)
                return (st, k), None

            (state, _), _ = jax.lax.scan(body, (state, key), None, length=T)
            return state

        run = jax.jit(chunk)
        dt = time_fn(run, state, jax.random.PRNGKey(1))
        rate = E * 30 / dt
        tag = "pallas" if use_pallas else "scan"
        results[f"rollout_policy_steps_per_sec_{tag}"] = round(rate, 1)
        print(f"policy rollout ({tag}) E={E}: {rate:,.0f} env-steps/s")

    # 3. PPO epoch
    from rvo3d_tpu.algo.trainer import Trainer

    cfg = Config(env=p, model=ModelConfig(),
                 train=TrainConfig(steps_per_epoch=300, num_envs=32))
    tr = Trainer(cfg, world)
    tr.run_epoch()
    t0 = time.perf_counter()
    tr.run_epoch()
    dt = time.perf_counter() - t0
    results["ppo_epoch_seconds"] = round(dt, 3)
    results["ppo_env_steps_per_sec"] = round(300 * 32 / dt, 1)
    print(f"PPO epoch (E=32, T=300, 8 drones): {dt:.2f}s "
          f"({300*32/dt:,.0f} env-steps/s incl. 8x(50pi+50v) updates)")

    # 4. w2-size train epoch (the runs/w2_r3b configuration): rollout vs
    # update wall-clock split — the measured explanation of the gap
    # between env-only stepping (~50M steps/s) and full training
    # (~3-4k steps/s at E=256), VERDICT r3 item 5 — plus a profiler trace.
    from rvo3d_tpu.algo.rollout import rollout_epoch
    from rvo3d_tpu.utils.profiler import trace
    from rvo3d_tpu.worlds import load_world

    wd2 = load_world("world_2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for tag, E, extra in (
        ("E256_reference_schedule", 256, {}),
        ("E4096_minibatch_batched", 4096,
         {"minibatch": 32768, "batched_update": True}),
    ):
        cfg2 = Config(
            env=EnvParams(num_drones=wd2.drone_num, safe_rewards=True),
            model=ModelConfig(log_std_init=-2.3),
            train=TrainConfig(steps_per_epoch=300, num_envs=E,
                              train_pi_iters=20, train_v_iters=50,
                              target_kl=0.01, pi_lr=1e-6,
                              action_mode="direct", **extra))
        tr2 = Trainer(cfg2, wd2.spec())
        roll = jax.jit(lambda params, carry, _t=tr2, _c=cfg2: rollout_epoch(
            _t.ac, _t.world, _c.env, _c.train, params, carry))
        dt_roll = time_fn(roll, tr2.ppo_state.params, tr2.carry)
        tr2.run_epoch()
        t0 = time.perf_counter()
        tr2.run_epoch()
        dt_full = time.perf_counter() - t0
        steps = 300 * E
        results[f"w2_{tag}"] = {
            "rollout_seconds": round(dt_roll, 3),
            "full_epoch_seconds": round(dt_full, 3),
            "update_seconds_approx": round(dt_full - dt_roll, 3),
            "env_steps_per_sec_full": round(steps / dt_full, 1),
            "env_steps_per_sec_rollout_only": round(steps / dt_roll, 1),
        }
        print(f"w2 {tag}: rollout {dt_roll:.2f}s, full {dt_full:.2f}s "
              f"-> {steps / dt_full:,.0f} env-steps/s full epoch")
        if tag == "E256_reference_schedule":
            with trace(os.path.join(repo, "profiles", "w2_train_epoch")):
                tr2.run_epoch()
            print("profiler trace: profiles/w2_train_epoch/")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_details.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
