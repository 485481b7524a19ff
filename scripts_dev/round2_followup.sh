#!/bin/bash
# Round-2 post-flagship queue: once the flagship pipeline exits, commit the
# flagship weights (insurance against session interruption), give each
# remaining registry robot a budgeted trained run with an fp16 deploy export
# into the repo-shipped models dir (committing each as it lands), then
# regenerate the registry-wide accuracy table and run the trained bench.
# Every stage under a hard timeout; exports fall back to the latest orbax
# checkpoint when a watchdog kill preempts --export.
# Usage: round2_followup.sh <wait_pid> [per_robot_budget_s]
set -u
WAIT_PID="${1:?wait pid}"
ROBOT_BUDGET="${2:-2100}"
BASE=/root/.cache/ikflow_tpu/training_logs
RMODELS=/root/repo/models
HERE="$(dirname "$0")"

echo "waiting on pid $WAIT_PID"
tail --pid="$WAIT_PID" -f /dev/null 2>/dev/null || true

commit_model() {
    local npz="$1" msg="$2"
    if [ -f "$RMODELS/$npz" ]; then
        (cd /root/repo && git add "models/$npz" && git commit -m "$msg") || true
    fi
}

commit_model panda__full.npz "models: add trained panda__full deploy weights"

train_one() {
    local robot="$1" nb="$2" dim="$3" npz="$4"
    if [ -f "$RMODELS/$npz" ]; then
        echo "=== $npz already present; skipping $robot ==="
        return
    fi
    echo "=== training $robot (nb_nodes=$nb dim=$dim budget=${ROBOT_BUDGET}s) ==="
    STALL_S=420 bash "$HERE/train_with_watchdog.sh" "$BASE/${robot}_r2" $((ROBOT_BUDGET + 420)) \
        --robot_name "$robot" --nb_nodes "$nb" --dim_latent_space "$dim" \
        --batch_size 2048 --learning_rate 2e-4 --gamma 0.9795 --step_lr_every 9766 \
        --n_steps 2000000 --on_device_data --steps_per_call 500 --time_budget_s "$ROBOT_BUDGET" \
        --eval_every 25000 --log_every 2500 --checkpoint_every 25000 \
        --dataset_size 10000000 \
        --export "$RMODELS/$npz" --export_dtype float16
    if [ ! -f "$RMODELS/$npz" ] && [ -d "$BASE/${robot}_r2/checkpoints" ]; then
        echo "=== $npz missing; exporting fp16 from latest checkpoint ==="
        timeout 900 python "$HERE/export_from_checkpoint.py" \
            --ckpt_dir "$BASE/${robot}_r2/checkpoints" --robot_name "$robot" \
            --nb_nodes "$nb" --dim_latent_space "$dim" --dtype float16 \
            --out "$RMODELS/$npz"
    fi
    commit_model "$npz" "models: add trained ${robot} deploy weights (${npz%.npz})"
}

train_one fetch     12 8  fetch__full.npz
train_one fetch_arm 16 10 fetch_arm__large.npz
train_one rizon4    12 7  rizon4__full.npz

echo "=== evaluate --all -> model_performances.md ==="
PERF=/root/repo/model_performances.md
[ -f "$PERF" ] && mv "$PERF" "$PERF.prev"
timeout 3600 python -m ikflow_tpu.cli.main evaluate --all \
    --performances_file "$PERF" > "$BASE/evaluate_all_r2.log" 2>&1 || true
tail -5 "$BASE/evaluate_all_r2.log"
if [ -f "$PERF" ]; then
    (cd /root/repo && git add model_performances.md && \
     git commit -m "Add registry-wide accuracy table (evaluate --all, trained r2 weights)") || true
fi

echo "=== trained bench ==="
timeout 1800 python /root/repo/bench.py > "$BASE/bench_trained_r2.json" 2>&1 || true
tail -1 "$BASE/bench_trained_r2.json"
echo "round2 followup done"
