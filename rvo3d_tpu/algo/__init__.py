from rvo3d_tpu.algo.gae import gae_advantages
from rvo3d_tpu.algo.ppo import PPOState, make_optimizers, ppo_update
from rvo3d_tpu.algo.rollout import RolloutBatch, rollout_epoch

__all__ = [
    "gae_advantages",
    "PPOState",
    "make_optimizers",
    "ppo_update",
    "RolloutBatch",
    "rollout_epoch",
]
