#!/bin/bash
# Round-5 serial TPU queue #4 — the committed >=1M env-steps/s training
# run (VERDICT r4 item 6): world_2, E=8192 lanes, minibatched joint
# updates (probe runs/w2_tpB measured 1.22M env-steps/s full-epoch at
# these settings), BC warm start + 30 PPO epochs, eval at every save.
set -x
cd /root/repo

# det eval of the w4 noise-fine-tune product (its in-training evals ran
# in noisy mode; the det number completes the row)
timeout 1200 python -m rvo3d_tpu.cli eval --world world_4 \
  --checkpoint runs/w4_nft --ckpt_epoch 5 --episodes 100 \
  --results_file runs/w4_nft/results.txt > runs/q4_w4_det.log 2>&1

timeout 4500 python -u -m rvo3d_tpu.cli train --world world_2 \
  --num_envs 8192 --steps_per_epoch 300 --action_mode direct \
  --log_std_init -2.3 --target_kl 0.01 --pi_lr 1e-6 --vf_lr 5e-5 \
  --train_pi_iters 20 --train_v_iters 30 --batched_update \
  --minibatch 16384 --vf_no_encoder --seed 7 \
  --bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1 \
  --bc_margin 0.3 \
  --train_epoch 30 --save_freq 5 --eval_every 5 --eval_episodes 100 \
  --quiet --run_dir runs/w2_1m > runs/q4_w2_1m.log 2>&1

E=$(python -c "import json;print(json.load(open('runs/w2_1m/best_checkpoint.json'))['epoch'])")
timeout 1200 python -m rvo3d_tpu.cli eval --world world_2 \
  --checkpoint runs/w2_1m --ckpt_epoch $E --noise --episodes 100 \
  --results_file runs/w2_1m/results.txt >> runs/q4_w2_1m.log 2>&1

echo QUEUE4-DONE
