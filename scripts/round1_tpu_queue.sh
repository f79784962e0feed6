#!/bin/bash
# Serial TPU job queue (ONE client at a time — see .claude/skills/verify).
set -x
cd /root/repo

# 1. evaluate the trained world_3 policy
timeout 1200 python -m rvo3d_tpu.cli eval --world world_3 \
  --checkpoint runs/world3_r0 --episodes 100 --lanes 8 \
  --results_file runs/world3_r0/results.txt

# 2. arrival-dominant run on world_2 (simplest scenario):
#    p_dest outweighs the cruise stream; shorter epochs
timeout 3600 python -u -m rvo3d_tpu.cli train --world world_2 \
  --num_envs 32 --train_epoch 400 --pi_lr 1e-4 --vf_lr 1e-3 \
  --p_dest 200 --p_way 30 --log_std_init -0.5 \
  --run_dir runs/world2_r0 --quiet

# 3. evaluate it
timeout 1200 python -m rvo3d_tpu.cli eval --world world_2 \
  --checkpoint runs/world2_r0 --episodes 100 --lanes 8 \
  --results_file runs/world2_r0/results.txt

# 4. bench sweep: env count scaling on one chip
for E in 4096 8192 16384; do
  RVO3D_BENCH_ENVS=$E timeout 900 python bench.py
done
