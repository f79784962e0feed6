#!/bin/bash
# Serial TPU queue #5 (post safe_rewards fix): curriculum training to a
# goal-reaching policy on world_2 / world_3, then eval + detailed bench.
set -x
cd /root/repo
for W in world_2 world_3; do
  timeout 5400 python -u -m rvo3d_tpu.cli train --world $W \
    --num_envs 128 --train_epoch 300 --pi_lr 1e-4 --vf_lr 1e-3 \
    --action_mode direct --bc_steps 1000 --bc_expert rvo \
    --curriculum '1.2:80,0.8:80,0.4:rest' \
    --p_dest 200 --p_way 30 --p_progress 5 --adv_norm \
    --run_dir runs/${W}_curr2 --quiet
  timeout 1800 python -m rvo3d_tpu.cli eval --world $W \
    --checkpoint runs/${W}_curr2 --episodes 100 --lanes 8 \
    --results_file runs/${W}_curr2/results.txt
done
timeout 3000 python scripts/bench_detail.py
