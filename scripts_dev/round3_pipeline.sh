#!/bin/bash
# Round-3 serialized chip pipeline: wait for the running flagship supervisor,
# run a +35 min flagship extension, then the trimmed training queue, then the
# measurement battery, then finalization. One process owns the chip end to end
# (two trainers contending crashes the tunneled worker — see OPERATIONS.md).
set -u
cd /root/repo

FLAGSHIP_SUPERVISOR_PID="$1"
echo "$(date -u +%H:%M:%S) pipeline waiting for flagship supervisor $FLAGSHIP_SUPERVISOR_PID"
while kill -0 "$FLAGSHIP_SUPERVISOR_PID" 2>/dev/null; do sleep 60; done
echo "$(date -u +%H:%M:%S) flagship main leg done; starting extension"

bash scripts_dev/train_with_watchdog.sh \
  /root/.cache/ikflow_tpu/training_logs/panda_full_r2 2400 \
  --robot_name panda --nb_nodes 12 --dim_latent_space 7 \
  --softflow_noise_scale 0.001 \
  --optimizer adamw --learning_rate 8.1e-5 --gamma 0.90 --step_lr_every 150000 \
  --batch_size 2048 --n_steps 3000000 --eval_every 20000 --log_every 2500 \
  --checkpoint_every 20000 --val_set_size 128 \
  --on_device_data --steps_per_call 500 --time_budget_s 2100 \
  --dataset_size 25000000 \
  --export /root/repo/models/panda__full.npz --export_dtype float16 --export_gate_mm 20

# Commit whatever flagship artifact exists now (trainer export or fallback).
if [ ! -n "$(find /root/repo/models/panda__full.npz -newermt '-2 hour' 2>/dev/null)" ]; then
    python scripts_dev/export_from_checkpoint.py \
        --ckpt_dir /root/.cache/ikflow_tpu/training_logs/panda_full_r2/checkpoints \
        --robot_name panda --out /root/repo/models/panda__full.npz \
        --nb_nodes 12 --dim_latent_space 7 --dtype float16 --gate_mm 20
fi
git add models/panda__full.npz 2>/dev/null && \
    git commit -q -m "models: flagship panda__full after round-3 training" || true

echo "$(date -u +%H:%M:%S) extension done; starting queue"
bash scripts_dev/round3_queue_b.sh

echo "$(date -u +%H:%M:%S) queue done; finalizing (table first: a round-end truncation should cost measurement legs, not the model table)"
bash scripts_dev/round3_finalize.sh

echo "$(date -u +%H:%M:%S) finalize done; starting measurement battery"
bash scripts_dev/round3_ab.sh
echo "$(date -u +%H:%M:%S) pipeline complete"
