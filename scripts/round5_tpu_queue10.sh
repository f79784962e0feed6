#!/bin/bash
# Round-5 serial TPU queue #10 (catch-up): noisy evals for the PPO
# epochs of w8_cw30 (best_checkpoint tie-kept epoch 0, so queue9 never
# measured 5/10 on the noise channel — and PPO epochs are where w8_m3n
# gained 0->64 %), then the q3_tpA.log regeneration.
set -x
cd /root/repo

for EP in 5 10; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
    --checkpoint runs/w8_cw30 --ckpt_epoch $EP --noise --episodes 100 \
    --results_file runs/w8_cw30/results.txt >> runs/q9_w8_cw30.log 2>&1
done

# regenerate the lost negative-result artifact runs/q3_tpA.log (the
# Pallas-GRU-in-update OOM probe cited by RESULTS.md) — command identical
# to scripts/round5_tpu_queue3.sh probe A; expected outcome is the OOM
BASE2="--world world_2 --steps_per_epoch 300 --action_mode direct
  --log_std_init -2.3 --target_kl 0.01 --pi_lr 1e-6 --vf_lr 5e-5
  --batched_update --vf_no_encoder --seed 7 --quiet"
BC2="--bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1 --bc_margin 0.3"
timeout 2400 python -u -m rvo3d_tpu.cli train $BASE2 $BC2 \
  --num_envs 8192 --minibatch 16384 --train_pi_iters 20 --train_v_iters 30 \
  --pallas_gru --train_epoch 4 --save_freq 100 --eval_episodes 40 \
  --run_dir runs/w2_tpA > runs/q3_tpA.log 2>&1
tail -3 runs/q3_tpA.log

echo QUEUE10-DONE
