"""Isolate BC fidelity: pretrain the policy on an analytic expert, then run
the reference's eval semantics on the BC-only policy (no PPO). Answers
whether closed-loop covariate shift (not PPO) breaks the clone.

Usage: python scripts/bc_eval.py [world] [expert] [bc_steps] [log_std]
"""

from __future__ import annotations

import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # container sitecustomize pins the axon TPU; mirror conftest's override
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")

from rvo3d_tpu.algo.bc import bc_pretrain
from rvo3d_tpu.algo.evaluator import evaluate
from rvo3d_tpu.algo.trainer import Trainer
from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
from rvo3d_tpu.worlds import load_world


def main():
    world_name = sys.argv[1] if len(sys.argv) > 1 else "world_2"
    expert = sys.argv[2] if len(sys.argv) > 2 else "rvo"
    bc_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    log_std = float(sys.argv[4]) if len(sys.argv) > 4 else -1.0
    explore_std = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

    wd = load_world(world_name)
    cfg = Config(
        env=EnvParams(num_drones=wd.drone_num, safe_rewards=True),
        model=ModelConfig(log_std_init=log_std),
        train=TrainConfig(action_mode="direct", num_envs=32),
        world=world_name,
    )
    trainer = Trainer(cfg, wd.spec())
    dagger = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    margin = float(sys.argv[7]) if len(sys.argv) > 7 else 0.4
    cw = float(sys.argv[8]) if len(sys.argv) > 8 else 1.0
    def on_round(r, p_round, loss_r):
        m = evaluate(trainer.ac, p_round, trainer.world, cfg.env,
                     jax.random.PRNGKey(0), num_episodes=8, num_lanes=8,
                     std_factor=1e-3, action_mode="direct")
        print(f"  round {r}: loss={loss_r:.5f} det-success="
              f"{m['success_rate']:.0%} EpLen={m['mean_ep_len']}", flush=True)

    params, loss = bc_pretrain(
        trainer.ac, trainer.ppo_state.params, trainer.world, cfg.env,
        jax.random.PRNGKey(8), num_envs=32, train_steps=bc_steps,
        expert=expert, action_mode="direct", explore_std=explore_std,
        demo_steps=400, dagger_rounds=dagger, expert_margin=margin,
        conflict_weight=cw, on_round=on_round)
    print(f"BC: {bc_steps} steps, explore_std={explore_std}, "
          f"dagger={dagger}, margin={margin}, cw={cw}, "
          f"final loss {loss:.5f}", flush=True)

    for std in (1e-3, 1.0):
        m = evaluate(trainer.ac, params, trainer.world, cfg.env,
                     jax.random.PRNGKey(0), num_episodes=100, num_lanes=16,
                     std_factor=std, action_mode="direct")
        print(f"{world_name} BC-only std_factor={std}: "
              f"success={m['success_rate']:.2%} EpLen={m['mean_ep_len']} "
              f"speed={m['mean_speed']}", flush=True)


if __name__ == "__main__":
    main()
