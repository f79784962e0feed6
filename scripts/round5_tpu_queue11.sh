#!/bin/bash
# Round-5 queue #11 (final): the capacity lever for world_8 — the
# w8_m3n recipe at rnn_hidden_dim 512 (cw=1). Noisy evals at epochs
# 0/5/10 unconditionally (queue9's best-epoch dedup skipped PPO epochs
# whenever the clone already scored det-100 %).
set -x
cd /root/repo

RECIPE="--num_envs 256 --steps_per_epoch 300 --action_mode direct
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20
  --train_v_iters 50 --batched_update --minibatch 16384
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5
  --eval_episodes 100 --seed 7 --vf_no_encoder --quiet"
BC="--bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1"

timeout 3600 python -u -m rvo3d_tpu.cli train --world world_8 $RECIPE $BC \
  --train_epoch 10 --bc_margin 0.3 --bc_slowdown --bc_env_noise \
  --rnn_hidden_dim 512 \
  --run_dir runs/w8_h512 > runs/q11_w8_h512.log 2>&1
for EP in 0 5 10; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
    --checkpoint runs/w8_h512 --ckpt_epoch $EP --noise --episodes 100 \
    --results_file runs/w8_h512/results.txt >> runs/q11_w8_h512.log 2>&1
done
echo QUEUE11-DONE
