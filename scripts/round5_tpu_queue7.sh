#!/bin/bash
# Round-5 queue #7: extend the best world_8 run (w8_m3n held det 100 % at
# epoch 10, noisy 64 %) by 20 more fixed-optimizer epochs — w4_fix30's
# noisy score kept improving with clean PPO (65 -> 74 % over 30 epochs).
set -x
cd /root/repo

timeout 3600 python -u -m rvo3d_tpu.cli train --world world_8 \
  --num_envs 256 --steps_per_epoch 300 --action_mode direct \
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20 \
  --train_v_iters 50 --batched_update --minibatch 16384 \
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5 \
  --eval_episodes 100 --seed 11 --vf_no_encoder --quiet \
  --train_epoch 20 \
  --resume runs/w8_m3n/ckpt --resume_epoch 10 --resume_params_only \
  --run_dir runs/w8_ext > runs/q7_w8_ext.log 2>&1
for EP in 5 10 15 20; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
    --checkpoint runs/w8_ext --ckpt_epoch $EP --noise --episodes 100 \
    --results_file runs/w8_ext/results.txt >> runs/q7_w8_ext.log 2>&1
done
echo QUEUE7-DONE
