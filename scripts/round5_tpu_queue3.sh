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
