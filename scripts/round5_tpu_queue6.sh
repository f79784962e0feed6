#!/bin/bash
# Round-5 serial TPU queue #6 (final): w2 1M-steps/s run + w4 det eval
# (queue4), w8 margin-0.2 clone (queue5), w32 epoch-5 evals + noise
# fine-tune from the held mixed clone.
set -x
cd /root/repo

bash scripts/round5_tpu_queue4.sh
bash scripts/round5_tpu_queue5.sh

# w32_m3s epoch-5 noisy evals (epoch 0 scored 70 % base)
for X in "" "--reverse"; do
  timeout 1800 python -m rvo3d_tpu.cli eval --world world32_mix \
    --checkpoint runs/w32_m3s --ckpt_epoch 5 $X --noise --episodes 100 \
    --results_file runs/w32_m3s/results.txt >> runs/q6_w32_evals.log 2>&1
done

# w32 noise fine-tune from the held epoch-5 clone (the w4_nft recipe that
# took world_4 from 73 % -> 97 % noisy)
timeout 5400 python -u -m rvo3d_tpu.cli train --world world32_mix \
  --num_envs 64 --steps_per_epoch 300 --action_mode direct \
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20 \
  --train_v_iters 50 --batched_update --minibatch 16384 \
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5 \
  --eval_episodes 100 --seed 7 --vf_no_encoder --train_noise --quiet \
  --multi_worlds world32_mix,world32_mix:rev \
  --train_epoch 10 \
  --resume runs/w32_m3s/ckpt --resume_epoch 5 --resume_params_only \
  --run_dir runs/w32_nft > runs/q6_w32_nft.log 2>&1
for EP in 5 10; do
  for X in "" "--reverse"; do
    timeout 1800 python -m rvo3d_tpu.cli eval --world world32_mix \
      --checkpoint runs/w32_nft --ckpt_epoch $EP $X --noise --episodes 100 \
      --results_file runs/w32_nft/results.txt >> runs/q6_w32_nft.log 2>&1
  done
done

echo QUEUE6-DONE
