#!/bin/bash
# Round-5 serial TPU queue #3 — full-epoch training throughput (VERDICT r4
# item 6: >=1 M env-steps/s full epoch on one chip with eval success
# unchanged). Probes 3 configs for 4 epochs each (train.jsonl records
# steps_per_sec), then runs the winner for 30 epochs from a BC warm start.
set -x
cd /root/repo

BASE="--world world_2 --steps_per_epoch 300 --action_mode direct
  --log_std_init -2.3 --target_kl 0.01 --pi_lr 1e-6 --vf_lr 5e-5
  --batched_update --vf_no_encoder --seed 7 --quiet"
BC="--bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1 --bc_margin 0.3"

# 0) world_3 hold run under the fix: 30 epochs from the margin-1.0 clone
#    (w3_r4 collapsed at epoch 30; w3_m10 was never PPO'd) — does the
#    vf_no_encoder fine-tune hold/sharpen det 100 % + noisy 94 %?
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_3 \
  --num_envs 256 --steps_per_epoch 300 --action_mode direct \
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20 \
  --train_v_iters 50 --batched_update --minibatch 16384 \
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5 \
  --eval_episodes 100 --seed 7 --vf_no_encoder --quiet \
  --train_epoch 30 \
  --resume runs/w3_m10/ckpt --resume_epoch 0 --resume_params_only \
  --run_dir runs/w3_fix30 > runs/q3_w3_fix30.log 2>&1
E=$(python -c "import json;print(json.load(open('runs/w3_fix30/best_checkpoint.json'))['epoch'])")
timeout 1200 python -m rvo3d_tpu.cli eval --world world_3 \
  --checkpoint runs/w3_fix30 --ckpt_epoch $E --noise --episodes 100 \
  --results_file runs/w3_fix30/results.txt >> runs/q3_w3_fix30.log 2>&1

# probe A: E=8192, mb=16k, 20pi+30v, Pallas GRU
timeout 2400 python -u -m rvo3d_tpu.cli train $BASE $BC \
  --num_envs 8192 --minibatch 16384 --train_pi_iters 20 --train_v_iters 30 \
  --pallas_gru --train_epoch 4 --save_freq 100 --eval_episodes 40 \
  --run_dir runs/w2_tpA > runs/q3_tpA.log 2>&1

# probe B: same, scan GRU (isolates the Pallas contribution)
timeout 2400 python -u -m rvo3d_tpu.cli train $BASE $BC \
  --num_envs 8192 --minibatch 16384 --train_pi_iters 20 --train_v_iters 30 \
  --train_epoch 4 --save_freq 100 --eval_episodes 40 \
  --run_dir runs/w2_tpB > runs/q3_tpB.log 2>&1

# probe C: E=16384, mb=32k, 10pi+20v, Pallas GRU
timeout 2400 python -u -m rvo3d_tpu.cli train $BASE $BC \
  --num_envs 16384 --minibatch 32768 --train_pi_iters 10 --train_v_iters 20 \
  --pallas_gru --train_epoch 4 --save_freq 100 --eval_episodes 40 \
  --run_dir runs/w2_tpC > runs/q3_tpC.log 2>&1

python - << 'EOF'
import json
for tag in ("A", "B", "C"):
    try:
        rates = [json.loads(l).get("steps_per_sec", 0)
                 for l in open(f"runs/w2_tp{tag}/train.jsonl")
                 if '"steps_per_sec"' in l]
        print(tag, [round(r) for r in rates])
    except FileNotFoundError:
        print(tag, "missing")
EOF
echo QUEUE3-PROBES-DONE

# Noise robustification under the fixed optimizer: round-4's train_noise
# fine-tunes were negative (det destroyed, noisy flat) — but that ran with
# the encoder in the vf mask, i.e. the collapse mechanism active. Retry
# with --vf_no_encoder: PPO optimizes expected return under the eval's
# own noise distribution while the encoder moves only at the KL-gated
# pi_lr.
NOISE_FT="--num_envs 256 --steps_per_epoch 300 --action_mode direct
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20
  --train_v_iters 50 --batched_update --minibatch 16384
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5
  --eval_episodes 100 --seed 7 --vf_no_encoder --train_noise --quiet"

timeout 3600 python -u -m rvo3d_tpu.cli train --world world_4 $NOISE_FT \
  --train_epoch 20 \
  --resume runs/w4_m12n/ckpt --resume_epoch 10 --resume_params_only \
  --run_dir runs/w4_nft > runs/q3_w4_nft.log 2>&1
for EP in 5 10 15 20; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_4 \
    --checkpoint runs/w4_nft --ckpt_epoch $EP --noise --episodes 100 \
    --results_file runs/w4_nft/results.txt >> runs/q3_w4_nft.log 2>&1
done

timeout 3600 python -u -m rvo3d_tpu.cli train --world world_8 $NOISE_FT \
  --train_epoch 20 \
  --resume runs/w8_m3n/ckpt --resume_epoch 10 --resume_params_only \
  --run_dir runs/w8_nft > runs/q3_w8_nft.log 2>&1
for EP in 5 10 15 20; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
    --checkpoint runs/w8_nft --ckpt_epoch $EP --noise --episodes 100 \
    --results_file runs/w8_nft/results.txt >> runs/q3_w8_nft.log 2>&1
done

# world32_mix: fresh mixed-set BC on the margin-0.3 SLOWDOWN expert
# (86 % noisy, ep_len 30 — twice as fast as the margin-0 expert the
# round-4 clone imitated) + 10 fixed-PPO epochs, both populations
timeout 5400 python -u -m rvo3d_tpu.cli train --world world32_mix \
  --num_envs 64 --steps_per_epoch 300 --action_mode direct \
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20 \
  --train_v_iters 50 --batched_update --minibatch 16384 \
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5 \
  --eval_episodes 100 --seed 7 --vf_no_encoder --quiet \
  --multi_worlds world32_mix,world32_mix:rev \
  --bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1 \
  --bc_margin 0.3 --bc_slowdown \
  --train_epoch 10 --run_dir runs/w32_m3s > runs/q3_w32_m3s.log 2>&1
E=$(python -c "import json;print(json.load(open('runs/w32_m3s/best_checkpoint.json'))['epoch'])")
for X in "" "--reverse"; do
  timeout 1800 python -m rvo3d_tpu.cli eval --world world32_mix \
    --checkpoint runs/w32_m3s --ckpt_epoch $E $X --noise --episodes 100 \
    --results_file runs/w32_m3s/results.txt >> runs/q3_w32_m3s.log 2>&1
done
echo QUEUE3-DONE
