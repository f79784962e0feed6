#!/bin/bash
# Serial TPU queue #4: BC + direct mode + goal-threshold curriculum.
set -x
cd /root/repo
for W in world_2 world_3; do
  timeout 5000 python -u -m rvo3d_tpu.cli train --world $W \
    --num_envs 32 --train_epoch 300 --pi_lr 1e-4 --vf_lr 1e-3 \
    --action_mode direct --bc_steps 1000 --bc_expert rvo \
    --curriculum '1.2:60,0.8:60,0.4:rest' \
    --p_dest 200 --p_way 30 --p_progress 5 --adv_norm \
    --run_dir runs/${W}_curr --quiet
  timeout 1500 python -m rvo3d_tpu.cli eval --world $W \
    --checkpoint runs/${W}_curr --episodes 100 --lanes 8 \
    --results_file runs/${W}_curr/results.txt
done
timeout 3000 python scripts/bench_detail.py
