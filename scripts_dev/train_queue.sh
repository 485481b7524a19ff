#!/bin/bash
# Sequential training queue for the non-flagship robots. Waits for a prior
# supervisor PID to exit, then trains each robot under its own watchdog.
# If a watchdog kill landed before the trainer's --export step, falls back to
# exporting from the latest checkpoint (scripts_dev/export_from_checkpoint.py).
# Usage: train_queue.sh <wait_pid>
set -u
WAIT_PID="${1:-}"

if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to finish..."
    tail --pid="$WAIT_PID" -f /dev/null 2>/dev/null || true
fi

BASE=/root/.cache/ikflow_tpu/training_logs
MODELS=/root/.cache/ikflow_tpu/models
HERE="$(dirname "$0")"

# export_or_fallback <run_dir> <robot> <nb_nodes> <dim_latent> <npz_name>
export_or_fallback() {
    local run_dir="$1" robot="$2" nb="$3" dim="$4" npz="$5"
    if [ ! -f "$MODELS/$npz" ] && [ -d "$run_dir/checkpoints" ]; then
        echo "=== $npz missing; exporting from latest checkpoint ==="
        timeout 600 python "$HERE/export_from_checkpoint.py" \
            --ckpt_dir "$run_dir/checkpoints" --robot_name "$robot" \
            --nb_nodes "$nb" --dim_latent_space "$dim" --out "$MODELS/$npz"
    fi
}

train_one() {
    local robot="$1" nb="$2" dim="$3" budget="$4" export_name="$5"
    echo "=== training $robot (nb_nodes=$nb dim=$dim budget=${budget}s) ==="
    STALL_S=420 bash "$HERE/train_with_watchdog.sh" "$BASE/${robot}_r1" "$budget" \
        --robot_name "$robot" --nb_nodes "$nb" --dim_latent_space "$dim" \
        --batch_size 4096 --learning_rate 2.5e-4 --gamma 0.9795 --step_lr_every 4883 \
        --n_steps 1000000 --on_device_data --steps_per_call 500 --time_budget_s $((budget - 240)) \
        --eval_every 25000 --log_every 500 --checkpoint_every 25000 \
        --export "$MODELS/$export_name"
    export_or_fallback "$BASE/${robot}_r1" "$robot" "$nb" "$dim" "$export_name"
}

# Panda post-training battery first (the flagship weights just landed).
export_or_fallback "$BASE/panda_full_r1" panda 12 7 panda__full.npz
if [ -f "$MODELS/panda__full.npz" ]; then
    echo "=== panda post-training eval ==="
    timeout 1500 python /root/repo/analysis/post_training_eval.py \
        --weights "$MODELS/panda__full.npz" > "$BASE/panda_post_eval.log" 2>&1
    echo "=== inference optimization A/B (xla vs pallas) ==="
    timeout 1200 python /root/repo/analysis/inference_optimization.py \
        > "$BASE/panda_inference_opt.log" 2>&1
    echo "=== bench.py (trained) ==="
    timeout 1200 python /root/repo/bench.py > "$BASE/panda_bench_trained.json" 2>&1
fi

train_one fetch_arm 16 10 2400 fetch_arm__large.npz
train_one fetch     12 8  2400 fetch__full.npz
train_one rizon4    12 7  2400 rizon4__full.npz
echo "train queue done"
