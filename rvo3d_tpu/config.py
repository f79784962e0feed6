"""Typed configuration for env / model / training / mesh.

Replaces the reference's argparse tree (reference: train/train_process.py:21-79)
with frozen dataclasses that are hashable, serializable, and safe to close over
inside jit. World selection is explicit (a registry name or path) instead of the
reference's hard-coded base_dir (reference: uaisa_env/drone_envs/env_base.py:15).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class EnvParams:
    """Static environment parameters.

    Defaults mirror the reference exactly:
      - goal_threshold/radius/priority/dt: uaisa_env/drone_envs/drone.py:14-15
      - max_acc/max_angle_change: drone.py:72-73
      - vel_max: drone.py:15 (1*ones(3))
      - acceler (action increment scale): ir_gym.py:18 (0.5)
      - neighbor_num nm: mdin.py:7 (10)
      - env_train/exp_radius/ctime_threshold/delta_t: rvo_inter.py:11-18
      - drone_range / building gates: hard-coded in rvo_inter.preprocess
        (rvo_inter.py:96 `dis <= 10`, :99-105 `h > z-2 and d2 <= 5`)
      - rvo reward params: ir_gym.py:65-71; move reward params: ir_gym.py:258-265
    """

    num_drones: int = 3
    neighbor_num: int = 10           # nm: max VO neighbor slots in the observation
    goal_threshold: float = 0.4
    radius: float = 0.2
    priority: float = 5.0
    dt: float = 1.0
    vel_max: float = 1.0             # per-axis max of the desired-velocity vector
    max_acc: float = 1.0
    max_angle_change: float = 90.0   # degrees
    acceler: float = 0.5             # abs_action = acceler*a_inc + cur_vel
    env_train: bool = True
    exp_radius: float = 0.2
    ctime_threshold: float = 2.0
    delta_t: float = 1.0
    drone_range: float = 10.0        # neighbor drone gate (hard-coded 10 m)
    building_range: float = 5.0      # building horizontal gate (hard-coded 5 m)
    building_z_slack: float = 2.0    # keep buildings with h > z - 2
    noise: bool = False              # Gaussian control noise (drone.py:79-82)
    control_std: float = 0.06
    # RVO reward params (p_base, p_dist, p_reverse, p_angle, p_urgent)
    rvo_p_base: float = -2.5
    rvo_p_urgent: float = -8.0
    # Move reward params (p_arrive, p_way, p_dest, p_dev, p_exlen, p_progress)
    mov_p_way: float = 3.0
    mov_p_dest: float = 20.0
    mov_p_exlen: float = -0.3
    mov_collision: float = -50.0
    # progress shaping: the reference designed but disabled a progress
    # reward (ir_gym.py:302-304 commented out; its init_goal_dist is a
    # dead placeholder). This is the working realization as potential-based
    # shaping: + p_progress * (per-step distance gained toward the active
    # waypoint). 0.0 = reference-faithful off.
    mov_p_progress: float = 0.0
    # guard the reference's unguarded division 0.2*|a|/|des_vel|
    # (ir_gym.py:88): an arrived drone has des_vel = 0, making its reward
    # inf, which NaN-poisons GAE/advantage normalization. False = parity
    # (reproduce the inf); True = clamp the denominator and the total.
    safe_rewards: bool = False
    # parity: replicate the reference's pervasive decimal rounding
    # (np.round(obs,2) ir_gym.py:229, round(reward,3) ir_gym.py:133/:311,
    #  round(des_vel,3) drone.py:207, round(alpha,2)/round(beta,2) vel_obs3D.py)
    parity_rounding: bool = True

    @property
    def rvo_state_dim(self) -> int:
        return 9

    @property
    def self_state_dim(self) -> int:
        return 12

    @property
    def obs_dim(self) -> int:
        return self.self_state_dim + self.rvo_state_dim * self.neighbor_num


def kinematic_variant_params(**overrides) -> "EnvParams":
    """The standalone `kinematic.py` model variant: identical speed/yaw/
    pitch kinematics but max_acc = 10 (vs drone.py:72's 1.0).

    Reference: uaisa_env/drone_envs/kinematic.py:12 — a dead duplicate
    upstream (its import is commented out, drone.py:11), kept here as a
    one-line preset so the variant is selectable. Parity test:
    tests/test_geometry.py::test_kinematic_variant_max_acc10."""
    kw = dict(max_acc=10.0)
    kw.update(overrides)
    return EnvParams(**kw)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Policy network shape. Defaults mirror train_process.py:36-46."""

    state_dim: int = 12
    rnn_input_dim: int = 9
    rnn_hidden_dim: int = 256
    hidden_sizes_ac: Tuple[int, ...] = (256, 256)
    hidden_sizes_v: Tuple[int, ...] = (256, 256)
    rnn_mode: str = "biGRU"          # 'GRU' | 'biGRU' | 'LSTM'
    log_std_init: float = -1.0       # policy_rnn_ac.py:198
    param_dtype: str = "float32"
    compute_dtype: str = "float32"   # set 'bfloat16' for MXU-friendly inference
    use_pallas_gru: bool = False     # fused TPU GRU kernel (ops/pallas_gru.py)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """PPO hyperparameters. Defaults mirror train_process.py:53-77."""

    pi_lr: float = 4e-6
    vf_lr: float = 5e-5
    train_epoch: int = 600
    steps_per_epoch: int = 300
    max_ep_len: int = 500
    gamma: float = 0.99
    lam: float = 0.97
    clip_ratio: float = 0.2
    train_pi_iters: int = 50
    train_v_iters: int = 50
    target_kl: float = 0.05
    max_update_num: int = 10         # cap on agents updated per epoch
    grad_clip_norm: float = 2.0
    # extensions beyond the reference (off by default = reference-faithful)
    adv_norm: bool = False           # per-agent advantage standardization
    ent_coef: float = 0.0            # entropy bonus coefficient
    # Recompute the behavior logp under the CURRENT params before each
    # agent's policy phase. The reference evaluates the stored rollout logp
    # against params already moved by earlier agents' updates in the same
    # epoch (multi_ppo.py:343-368 shares one encoder), so a later agent can
    # see first-iteration KL > target_kl and silently lose its whole update
    # (observed live: pi_iters == 0). False = reference-faithful.
    fresh_logp: bool = False
    # PPO2-style value clipping (|v - v_rollout| <= value_clip in the loss);
    # 0.0 = reference-faithful plain MSE (multi_ppo.py:379-383).
    value_clip: float = 0.0
    # Fast mode: ONE joint update over all agents (flatten [T,E,N] -> [B])
    # instead of the reference's sequential shuffled per-agent schedule —
    # ~N x fewer GRU passes at N x the batch, same clipped-surrogate math.
    # False = reference-faithful sequential schedule.
    batched_update: bool = False
    # Minibatch size for the pi/v inner iterations (0 = reference-faithful
    # full-batch: every iteration consumes ALL [T*E] samples, so update
    # cost grows linearly with num_envs and dominates epochs at E >= 1024).
    # When > 0, each iteration optimizes a random CONTIGUOUS
    # dynamic-slice of the flattened batch — gather-free by construction
    # (the axon TPU backend miscompiles small-gather lowerings, see
    # env/state.py:_wp_select), and contiguous [k*E] windows still span
    # every env lane. KL early-stop is then measured per-minibatch, so the
    # logged kl/pi_loss are per-window ESTIMATES (noisier than, and not
    # directly comparable to, full-batch runs' metrics) and the early-stop
    # decision itself is sampled (ADVICE r4).
    minibatch: int = 0
    # The reference's vf Adam optimizes {encoder, critic} — the shared
    # encoder sits in BOTH optimizers (policy_rnn_ac.py:46-54 module
    # sharing + multi_ppo.py:115-116), so even a pi_lr=0 run drifts the
    # deterministic policy through the value loss at vf_lr. Round-5
    # root-cause experiments on the fine-tune collapse (RESULTS.md):
    # False = vf Adam touches ONLY the critic head; the encoder trains
    # solely at pi_lr through the policy loss. True = reference-faithful.
    vf_encoder: bool = True
    # Exclude the encoder from BOTH optimizers (fine-tune only the
    # actor/critic heads + log_std on top of a frozen BC-clone encoder).
    freeze_encoder: bool = False
    # 'increment': the reference trainer's velocity-anchored mapping
    #   abs = acceler*a + vel (multi_ppo.py:202-205) — NOTE this adds the
    #   velocity VECTOR to a [acc, Δyaw, Δpitch] command, which strips the
    #   policy of angle authority whenever |v_y| or |v_z| > acceler (the
    #   root cause of the reference checkpoints' spiral/dive failures).
    # 'direct': the policy commands [acc, Δyaw, Δpitch] directly.
    action_mode: str = "increment"
    seed: int = 7
    save_freq: int = 50
    num_envs: int = 1                # E: vectorized env instances (reference: 1)
    std_factor_eval: float = 1e-3    # post_train.py:27


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh. Env batch shards over 'data'; optional tensor parallel
    over 'model' (the reference's dead MPI scaffold, multi_ppo.py:162-164,
    becomes first-class XLA collectives over ICI)."""

    data: int = 1
    model: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    env: EnvParams = dataclasses.field(default_factory=EnvParams)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    world: str = "world_3"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def from_dict(d: dict) -> Config:
    return Config(
        env=EnvParams(**d.get("env", {})),
        model=ModelConfig(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in d.get("model", {}).items()}),
        train=TrainConfig(**d.get("train", {})),
        mesh=MeshConfig(**d.get("mesh", {})),
        world=d.get("world", "world_3"),
    )
