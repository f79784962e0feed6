#!/bin/bash
# Round-5 serial TPU queue #1 (ONE TPU client at a time):
#  A) world_4 fine-tune-collapse controls, all from the SAME BC-clone
#     checkpoint (runs/w4_r4/ckpt epoch 0), 15 epochs, eval every epoch:
#     - w4_vonly : pi updates disabled entirely (train_pi_iters 0) — if the
#                  det 100->0 flip still happens, the value phase alone
#                  destroys the policy (encoder drift through the vf Adam)
#     - w4_vnoenc: vf optimizer excludes the shared encoder, pi normal —
#                  if the flip vanishes, the mechanism is confirmed + fixed
#     - w4_vlr6  : vf_lr also 10x down (5e-6), pi normal — lr-scaling control
#  B) bench.py with 5 repeats (spread for the 17 % r03->r04 question)
#  C) sequential-update device-fault bisect (subprocess-isolated variants)
set -x
cd /root/repo

COMMON="--world world_4 --num_envs 256 --train_epoch 15 --steps_per_epoch 300
  --action_mode direct --log_std_init -2.3 --target_kl 0.01
  --train_pi_iters 20 --train_v_iters 50 --batched_update --minibatch 16384
  --save_freq 5 --eval_every 1 --eval_episodes 100 --seed 7
  --resume runs/w4_r4/ckpt --resume_epoch 0 --resume_params_only --quiet"

timeout 2400 python -u -m rvo3d_tpu.cli train $COMMON \
  --pi_lr 1e-6 --vf_lr 5e-5 --train_pi_iters 0 \
  --run_dir runs/w4_vonly > runs/q1_w4_vonly.log 2>&1

timeout 2400 python -u -m rvo3d_tpu.cli train $COMMON \
  --pi_lr 1e-6 --vf_lr 5e-5 --vf_no_encoder \
  --run_dir runs/w4_vnoenc > runs/q1_w4_vnoenc.log 2>&1

timeout 2400 python -u -m rvo3d_tpu.cli train $COMMON \
  --pi_lr 1e-6 --vf_lr 5e-6 \
  --run_dir runs/w4_vlr6 > runs/q1_w4_vlr6.log 2>&1

RVO3D_BENCH_REPEATS=5 timeout 1800 python bench.py > bench_r5_spread.json 2> runs/q1_bench.log

timeout 7200 python -u scripts/tpu_seqfault_repro.py > runs/q1_seqfault.log 2>&1

echo QUEUE1-DONE
