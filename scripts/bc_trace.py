"""Trace a deterministic closed-loop rollout of the BC policy vs the expert
on one env: per-step position, waypoint index, distance to current target,
action of each. Pinpoints where the clone diverges."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rvo3d_tpu.algo.bc import bc_pretrain
from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
from rvo3d_tpu.env.env import observe, reset, step
from rvo3d_tpu.env.rvo_policy import rvo_controller
from rvo3d_tpu.models import ActorCritic
from rvo3d_tpu.algo.trainer import Trainer
from rvo3d_tpu.worlds import load_world


def main():
    world_name = sys.argv[1] if len(sys.argv) > 1 else "world_2"
    explore_std = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15
    wd = load_world(world_name)
    world = wd.spec()
    p = EnvParams(num_drones=wd.drone_num, safe_rewards=True)
    cfg = Config(env=p, model=ModelConfig(),
                 train=TrainConfig(action_mode="direct"), world=world_name)
    trainer = Trainer(cfg, world)
    params, loss = bc_pretrain(
        trainer.ac, trainer.ppo_state.params, world, p,
        jax.random.PRNGKey(8), num_envs=32, train_steps=3000,
        expert="rvo", action_mode="direct", explore_std=explore_std,
        demo_steps=400, dagger_rounds=3, expert_margin=0.3)
    print(f"BC loss {loss:.5f}", flush=True)
    ac = trainer.ac

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
    for t in range(60):
        mu, state = policy_step(state)
        a = jnp.round(mu, 2)
        ea = expert_a(state)
        state, out = env_step(state, a)
        pos = np.asarray(state.pos)
        wp = np.asarray(state.wp_idx)
        d0 = np.asarray(jnp.linalg.norm(
            state.pos - state.current_des(world), axis=-1))
        print(f"t={t:3d} wp={wp} |d_wp|={np.round(d0, 2)} "
              f"fin={np.asarray(out.finish).astype(int)} "
              f"col={np.asarray(out.done).astype(int)} "
              f"a0={np.round(np.asarray(a)[0], 2)} "
              f"ea0={np.round(np.asarray(ea)[0], 2)} "
              f"pos0={np.round(pos[0], 2)}", flush=True)
        if bool(jnp.all(out.finish)) or bool(jnp.any(out.done)):
            print("episode end", flush=True)
            break


if __name__ == "__main__":
    main()
