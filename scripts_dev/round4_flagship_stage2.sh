#!/bin/bash
# Flagship decay continuation #2: 2.53M -> ~2.95M steps. The 500x50 protocol
# row moved 8.60 -> 8.21 -> 8.10 mm over the two r4 decay blocks (~0.1 mm per
# 330k steps at LR ~1e-5); this block targets the <=8.0 bar. Run AFTER
# round4_queue.sh, BEFORE round4_finalize.sh (so the final table grades the
# best weights).
set -u
cd /root/repo
LOGS=/root/.cache/ikflow_tpu/training_logs
bash scripts_dev/train_with_watchdog.sh "$LOGS/panda_full_r2" 3300 \
    --robot_name panda --nb_nodes 12 --dim_latent_space 7 \
    --learning_rate 8.1e-5 --gamma 0.9 --step_lr_every 120000 \
    --batch_size 2048 --n_steps 2950000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 2700 \
    --export /root/repo/models/panda__full.npz --export_dtype float16 \
    --export_gate_mm 8.0
