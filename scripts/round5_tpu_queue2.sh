#!/bin/bash
# Round-5 serial TPU queue #2 — the vf_no_encoder recipe applied:
#  1) w4_fix30 : world_4, 30 PPO epochs from the BC clone with the vf
#                optimizer excluding the shared encoder (the round-5
#                root-cause fix) — the VERDICT r4 #1 done-criterion run
#  2) w4_m12n  : world_4 fresh BC at margin 1.2 + slowdown + env-noise
#                demos (expert measured 99 % noisy) + 10 fixed-PPO epochs
#  3) w8_m3n   : world_8 fresh BC at margin 0.3 + slowdown + env-noise
#                demos (expert ceiling 83 % noisy) + 10 fixed-PPO epochs
#  4) w32_fix  : world32_mix both populations, resumed from the det-100 %
#                epoch-10 checkpoint, 10 fixed-PPO epochs (does the fix
#                hold the previously collapsing multi-scenario policy?)
# plus noisy evals of each product checkpoint.
set -x
cd /root/repo

RECIPE="--num_envs 256 --steps_per_epoch 300 --action_mode direct
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20
  --train_v_iters 50 --batched_update --minibatch 16384
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5
  --eval_episodes 100 --seed 7 --vf_no_encoder --quiet"
BC="--bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1"

best_epoch () { python -c "import json;print(json.load(open('$1/best_checkpoint.json'))['epoch'])"; }

# 1) the 30-epoch hold run
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_4 $RECIPE \
  --train_epoch 30 \
  --resume runs/w4_r4/ckpt --resume_epoch 0 --resume_params_only \
  --run_dir runs/w4_fix30 > runs/q2_w4_fix30.log 2>&1
timeout 1200 python -m rvo3d_tpu.cli eval --world world_4 \
  --checkpoint runs/w4_fix30 --noise --episodes 100 \
  --results_file runs/w4_fix30/results.txt >> runs/q2_w4_fix30.log 2>&1

# 2) world_4 noise-targeted BC
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_4 $RECIPE $BC \
  --train_epoch 10 --bc_margin 1.2 --bc_slowdown --bc_env_noise \
  --run_dir runs/w4_m12n > runs/q2_w4_m12n.log 2>&1
E=$(best_epoch runs/w4_m12n)
for X in "" "--noise"; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_4 \
    --checkpoint runs/w4_m12n --ckpt_epoch $E $X --episodes 100 \
    --results_file runs/w4_m12n/results.txt >> runs/q2_w4_m12n.log 2>&1
done

# 3) world_8 noise-targeted BC
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_8 $RECIPE $BC \
  --train_epoch 10 --bc_margin 0.3 --bc_slowdown --bc_env_noise \
  --run_dir runs/w8_m3n > runs/q2_w8_m3n.log 2>&1
E=$(best_epoch runs/w8_m3n)
for X in "" "--noise"; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
    --checkpoint runs/w8_m3n --ckpt_epoch $E $X --episodes 100 \
    --results_file runs/w8_m3n/results.txt >> runs/q2_w8_m3n.log 2>&1
done

# 4) world32_mix hold test from the round-4 product checkpoint
timeout 5400 python -u -m rvo3d_tpu.cli train --world world32_mix $RECIPE \
  --num_envs 64 --train_epoch 10 \
  --multi_worlds world32_mix,world32_mix:rev \
  --resume runs/w32_multi_c/ckpt --resume_epoch 10 --resume_params_only \
  --run_dir runs/w32_fix > runs/q2_w32_fix.log 2>&1
E=$(best_epoch runs/w32_fix)
for X in "" "--reverse"; do
  timeout 1800 python -m rvo3d_tpu.cli eval --world world32_mix \
    --checkpoint runs/w32_fix --ckpt_epoch $E $X --noise --episodes 100 \
    --results_file runs/w32_fix/results.txt >> runs/q2_w32_fix.log 2>&1
done

echo QUEUE2-DONE
