#!/bin/bash
# Round-2 stage 3: after the main followup queue, give the two remaining
# registry entries (panda_lite, fetch__large) short trained runs so every
# model_descriptions.yaml entry loads, then refresh the accuracy table.
# Usage: round2_extras.sh <wait_pid> [per_robot_budget_s]
set -u
WAIT_PID="${1:?wait pid}"
ROBOT_BUDGET="${2:-1200}"
BASE=/root/.cache/ikflow_tpu/training_logs
RMODELS=/root/repo/models
HERE="$(dirname "$0")"

echo "waiting on pid $WAIT_PID"
tail --pid="$WAIT_PID" -f /dev/null 2>/dev/null || true

train_one() {
    local robot="$1" nb="$2" dim="$3" npz="$4" run="$5"
    if [ -f "$RMODELS/$npz" ]; then
        echo "=== $npz already present; skipping ==="
        return
    fi
    echo "=== training $run (nb_nodes=$nb dim=$dim budget=${ROBOT_BUDGET}s) ==="
    STALL_S=420 bash "$HERE/train_with_watchdog.sh" "$BASE/${run}" $((ROBOT_BUDGET + 420)) \
        --robot_name "$robot" --nb_nodes "$nb" --dim_latent_space "$dim" \
        --batch_size 2048 --learning_rate 2e-4 --gamma 0.9795 --step_lr_every 9766 \
        --n_steps 2000000 --on_device_data --steps_per_call 500 --time_budget_s "$ROBOT_BUDGET" \
        --eval_every 25000 --log_every 2500 --checkpoint_every 25000 \
        --dataset_size 10000000 \
        --export "$RMODELS/$npz" --export_dtype float16
    if [ ! -f "$RMODELS/$npz" ] && [ -d "$BASE/${run}/checkpoints" ]; then
        timeout 900 python "$HERE/export_from_checkpoint.py" \
            --ckpt_dir "$BASE/${run}/checkpoints" --robot_name "$robot" \
            --nb_nodes "$nb" --dim_latent_space "$dim" --dtype float16 \
            --out "$RMODELS/$npz"
    fi
    if [ -f "$RMODELS/$npz" ]; then
        (cd /root/repo && git add "models/$npz" && \
         git commit -m "models: add trained ${npz%.npz} deploy weights") || true
    fi
}

train_one panda 6  7  panda__lite.npz  panda_lite_r2
train_one fetch 16 8  fetch__large.npz fetch_large_r2

echo "=== refresh accuracy table with all registry entries ==="
PERF=/root/repo/model_performances.md
[ -f "$PERF" ] && mv "$PERF" "$PERF.prev"
timeout 3600 python -m ikflow_tpu.cli.main evaluate --all \
    --performances_file "$PERF" > "$BASE/evaluate_all_r2b.log" 2>&1 || true
tail -5 "$BASE/evaluate_all_r2b.log"
if [ -f "$PERF" ]; then
    (cd /root/repo && git add model_performances.md && \
     git commit -m "Refresh registry-wide accuracy table with all six trained models") || true
fi
echo "round2 extras done"
