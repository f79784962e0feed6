#!/bin/bash
# Round-5 serial TPU queue #9 — the conflict-weighted-BC lever (the
# RESULTS.md closing diagnostic's named next lever, untested so far) on
# the two worlds still under the 80 % noisy bar, plus a larger-encoder
# arm for world_8 and the q3_tpA.log regeneration:
#  1) w8_cw30  : w8_m3n recipe + --bc_conflict_weight 30
#  2) w32_cw30 : w32_m3s recipe + --bc_conflict_weight 30
#  3) tpA      : regenerate the lost Pallas-GRU-OOM negative artifact
#  4) w8_cw100 : conflict weight 100 (conflict ~0.4 % of the stream; 30/
#                100 give the class ~11 %/29 % of the BC gradient)
#  5) w8_h512  : rnn_hidden_dim 512 (capacity lever)
# Det trajectories come from the in-loop evals (eval_every 5); the
# standalone evals here measure the NOISY channel at the clone (epoch 0)
# and the best epoch, so the BC-stage effect is separable from PPO's.
set -x
cd /root/repo

RECIPE="--num_envs 256 --steps_per_epoch 300 --action_mode direct
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20
  --train_v_iters 50 --batched_update --minibatch 16384
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5
  --eval_episodes 100 --seed 7 --vf_no_encoder --quiet"
BC="--bc_steps 2000 --bc_expert rvo --bc_dagger 3 --bc_noise 0.1"

best_epoch () { python -c "import json;print(json.load(open('$1/best_checkpoint.json'))['epoch'])"; }

run_w8 () {  # $1 run name, $@ extra flags
  NAME=$1; shift
  timeout 3600 python -u -m rvo3d_tpu.cli train --world world_8 $RECIPE $BC \
    --train_epoch 10 --bc_margin 0.3 --bc_slowdown --bc_env_noise "$@" \
    --run_dir runs/$NAME > runs/q9_$NAME.log 2>&1
  E=$(best_epoch runs/$NAME)
  EPS="0 $E"; [ "$E" = "0" ] && EPS="0"
  for EP in $EPS; do
    timeout 1200 python -m rvo3d_tpu.cli eval --world world_8 \
      --checkpoint runs/$NAME --ckpt_epoch $EP --noise --episodes 100 \
      --results_file runs/$NAME/results.txt >> runs/q9_$NAME.log 2>&1
  done
}

run_w8 w8_cw30 --bc_conflict_weight 30

# world32_mix mixed-set clone with the conflict weight
timeout 5400 python -u -m rvo3d_tpu.cli train --world world32_mix \
  --num_envs 64 --steps_per_epoch 300 --action_mode direct \
  --log_std_init -2.3 --target_kl 0.01 --train_pi_iters 20 \
  --train_v_iters 50 --batched_update --minibatch 16384 \
  --pi_lr 1e-6 --vf_lr 5e-5 --save_freq 5 --eval_every 5 \
  --eval_episodes 100 --seed 7 --vf_no_encoder --quiet \
  --multi_worlds world32_mix,world32_mix:rev \
  $BC --bc_margin 0.3 --bc_slowdown --bc_conflict_weight 30 \
  --train_epoch 10 --run_dir runs/w32_cw30 > runs/q9_w32_cw30.log 2>&1
E=$(best_epoch runs/w32_cw30)
EPS="0 $E"; [ "$E" = "0" ] && EPS="0"
for EP in $EPS; do
  for X in "" "--reverse"; do
    timeout 1800 python -m rvo3d_tpu.cli eval --world world32_mix \
      --checkpoint runs/w32_cw30 --ckpt_epoch $EP $X --noise --episodes 100 \
      --results_file runs/w32_cw30/results.txt >> runs/q9_w32_cw30.log 2>&1
  done
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

run_w8 w8_cw100 --bc_conflict_weight 100
run_w8 w8_h512 --rnn_hidden_dim 512

echo QUEUE9-DONE
