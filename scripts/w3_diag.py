"""world_3 deterministic-clone diagnosis (round 4).

Round-3 finding (runs/w3_r3 + scripts/bc_eval.py): the world_3 BC clone
succeeds 85 % at std_factor=1.0 but 0 % deterministically — the Gaussian
MEAN is broken at the 3-drone crossing while noise-broken symmetry works.
This script trains the clone once, pickles the params, then traces the
deterministic rollout (evaluator semantics: round(mu, 2)) step by step:
per-drone positions, waypoint indices, min pairwise distance, and the
expert's command at the same states — to pinpoint where/why the mean
fails (collision? overshoot? freeze?).

Usage: python scripts/w3_diag.py [world] [params_pkl] [--reuse]
"""

from __future__ import annotations

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")

from rvo3d_tpu.algo.bc import bc_pretrain
from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
from rvo3d_tpu.env.env import observe, reset, step
from rvo3d_tpu.env.rvo_policy import rvo_controller
from rvo3d_tpu.algo.trainer import Trainer
from rvo3d_tpu.worlds import load_world


def main():
    world_name = sys.argv[1] if len(sys.argv) > 1 else "world_3"
    pkl = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{world_name}_bc.pkl"
    reuse = "--reuse" in sys.argv

    wd = load_world(world_name)
    world = wd.spec()
    p = EnvParams(num_drones=wd.drone_num, safe_rewards=True)
    cfg = Config(env=p, model=ModelConfig(log_std_init=-2.3),
                 train=TrainConfig(action_mode="direct"), world=world_name)
    trainer = Trainer(cfg, world)
    ac = trainer.ac

    if reuse and os.path.exists(pkl):
        with open(pkl, "rb") as f:
            params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
        print(f"reused params from {pkl}", flush=True)
    else:
        params, loss = bc_pretrain(
            trainer.ac, trainer.ppo_state.params, world, p,
            jax.random.PRNGKey(8), num_envs=32, train_steps=2000,
            expert="rvo", action_mode="direct", explore_std=0.1,
            demo_steps=400, dagger_rounds=3, expert_margin=0.3)
        print(f"BC loss {loss:.5f}", flush=True)
        with open(pkl, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)

    @jax.jit
    def policy_step(state):
        out, st = observe(world, state, p)
        mu, std, v = ac.apply(params, out.obs_self, out.obs_nbr,
                              out.obs_mask)
        return mu, st

    @jax.jit
    def env_step(state, a):
        return step(world, state, a, p)

    @jax.jit
    def expert_a(state):
        return rvo_controller(state, world, p)

    state = reset(world, p)
    n = int(state.pos.shape[0])
    for t in range(80):
        mu, state = policy_step(state)
        a = jnp.round(mu, 2)
        ea = expert_a(state)
        pre_pos = np.asarray(state.pos)
        state, out = env_step(state, a)
        pos = np.asarray(state.pos)
        wp = np.asarray(state.wp_idx)
        dmat = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        dmat[np.arange(n), np.arange(n)] = np.inf
        mind = dmat.min()
        d0 = np.asarray(jnp.linalg.norm(
            state.pos - state.current_des(world), axis=-1))
        print(f"t={t:3d} wp={wp} |d_wp|={np.round(d0, 2)} "
              f"min_pair={mind:.2f} "
              f"fin={np.asarray(out.finish).astype(int)} "
              f"done={np.asarray(out.done).astype(int)}", flush=True)
        for i in range(n):
            print(f"    d{i} pos={np.round(pos[i], 2)} "
                  f"a={np.round(np.asarray(a)[i], 2)} "
                  f"ea={np.round(np.asarray(ea)[i], 2)}", flush=True)
        if bool(jnp.all(out.finish)) or bool(jnp.any(out.done)):
            print("episode end", flush=True)
            break


if __name__ == "__main__":
    main()
