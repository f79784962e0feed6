#!/bin/bash
# Serial TPU queue #3: direct action mode + BC(rvo) warm start + shaped PPO.
set -x
cd /root/repo

for W in world_2 world_3; do
  timeout 4000 python -u -m rvo3d_tpu.cli train --world $W \
    --num_envs 32 --train_epoch 300 --pi_lr 1e-4 --vf_lr 1e-3 \
    --action_mode direct --bc_steps 1000 --bc_expert rvo \
    --p_dest 200 --p_way 30 --p_progress 5 --log_std_init -1.0 \
    --adv_norm --run_dir runs/${W}_bc --quiet

  timeout 1500 python -m rvo3d_tpu.cli eval --world $W \
    --checkpoint runs/${W}_bc --episodes 100 --lanes 8 \
    --results_file runs/${W}_bc/results.txt
done

timeout 3000 python scripts/bench_detail.py
