#!/bin/bash
# Round-5 queue, part B: the two remaining training legs (VERDICT r4 ask #4).
# Leg 1 (panda__full_sigmoid) already shipped at 500k steps / 8.44 mm val —
# re-running it would waste the chip, so this script runs only:
#
#   2. rizon4: worst table row (9.74 deg mean angular at 200k steps) —
#      warm-start anneal from the shipped artifact.
#   3. fetch__large: 16-block at 380k steps — polish anneal.
#
# NO GATE VALUES HERE: exports resolve their quality gate from
# model_descriptions.yaml export_gate_mm + the no-regression rule
# (training/checkpoints.py::resolve_export_gate).
set -u
cd /root/repo
LOGS=/root/.cache/ikflow_tpu/training_logs
W=scripts_dev/train_with_watchdog.sh
mkdir -p "$LOGS"

# ---- 2. rizon4: warm-start anneal from the shipped 200k-step artifact.
bash "$W" "$LOGS/rizon4_r5" 4200 \
    --robot_name rizon4 --nb_nodes 12 --dim_latent_space 7 \
    --init_npz /root/repo/models/rizon4__full.npz \
    --learning_rate 8e-5 --gamma 0.9 --step_lr_every 120000 --warmup_steps 1000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 1000000 --eval_every 10000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 3900 \
    --export /root/repo/models/rizon4__full.npz --export_dtype float16

# ---- 3. fetch__large: polish anneal from 380k steps (val 10.16 mm).
bash "$W" "$LOGS/fetch_large_r5" 2400 \
    --robot_name fetch --nb_nodes 16 --dim_latent_space 8 \
    --init_npz /root/repo/models/fetch__large.npz \
    --learning_rate 5e-5 --gamma 0.85 --step_lr_every 60000 --warmup_steps 2000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 500000 --eval_every 10000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 2100 \
    --export /root/repo/models/fetch__large.npz --export_dtype float16

echo "round5_queue_b done"
