#!/bin/bash
# Round-5 serial TPU queue #8: REGENERATE the three queue-2 runs that were
# produced and cited in RESULTS.md but never committed (lost from the
# container): w4_fix30, w4_m12n, w8_m3n. Commands are byte-identical to
# scripts/round5_tpu_queue2.sh (seed 7 throughout), so the artifacts are
# deterministic regenerations; evals re-measure the cited numbers.
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
  --run_dir runs/w4_fix30 > runs/q8_w4_fix30.log 2>&1
timeout 1200 python -m rvo3d_tpu.cli eval --world world_4 \
  --checkpoint runs/w4_fix30 --noise --episodes 100 \
  --results_file runs/w4_fix30/results.txt >> runs/q8_w4_fix30.log 2>&1

# 2) world_4 noise-targeted BC
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_4 $RECIPE $BC \
  --train_epoch 10 --bc_margin 1.2 --bc_slowdown --bc_env_noise \
  --run_dir runs/w4_m12n > runs/q8_w4_m12n.log 2>&1
E=$(best_epoch runs/w4_m12n)
for X in "" "--noise"; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_4 \
    --checkpoint runs/w4_m12n --ckpt_epoch $E $X --episodes 100 \
    --results_file runs/w4_m12n/results.txt >> runs/q8_w4_m12n.log 2>&1
done

# 3) world_8 noise-targeted BC
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_8 $RECIPE $BC \
  --train_epoch 10 --bc_margin 0.3 --bc_slowdown --bc_env_noise \
  --run_dir runs/w8_m3n > runs/q8_w8_m3n.log 2>&1
E=$(best_epoch runs/w8_m3n)
for X in "" "--noise"; do
  timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
    --checkpoint runs/w8_m3n --ckpt_epoch $E $X --episodes 100 \
    --results_file runs/w8_m3n/results.txt >> runs/q8_w8_m3n.log 2>&1
done

echo QUEUE8-DONE
