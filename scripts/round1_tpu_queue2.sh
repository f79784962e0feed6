#!/bin/bash
# Serial TPU queue #2: arrival-learning demos with progress shaping.
set -x
cd /root/repo

# 1. world_2 with progress shaping + arrival-dominant terminal reward
timeout 4000 python -u -m rvo3d_tpu.cli train --world world_2 \
  --num_envs 32 --train_epoch 400 --pi_lr 1e-4 --vf_lr 1e-3 \
  --p_dest 200 --p_way 30 --p_progress 5 --log_std_init -0.5 \
  --adv_norm --run_dir runs/world2_shaped --quiet

timeout 1200 python -m rvo3d_tpu.cli eval --world world_2 \
  --checkpoint runs/world2_shaped --episodes 100 --lanes 8 \
  --results_file runs/world2_shaped/results.txt

# 2. world_3 with the same recipe
timeout 4000 python -u -m rvo3d_tpu.cli train --world world_3 \
  --num_envs 32 --train_epoch 400 --pi_lr 1e-4 --vf_lr 1e-3 \
  --p_dest 200 --p_way 30 --p_progress 5 --log_std_init -0.5 \
  --adv_norm --run_dir runs/world3_shaped --quiet

timeout 1200 python -m rvo3d_tpu.cli eval --world world_3 \
  --checkpoint runs/world3_shaped --episodes 100 --lanes 8 \
  --results_file runs/world3_shaped/results.txt

# 3. detailed perf measurement
timeout 3000 python scripts/bench_detail.py
