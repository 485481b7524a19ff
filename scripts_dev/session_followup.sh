#!/bin/bash
# Post-flagship queue for this session: wait for the flagship supervisor,
# export (fallback from checkpoint if the watchdog preempted --export), run
# the trained bench in fp32 and bf16 (A/B on the real chip; the better default
# is decided by a human afterwards), then give each remaining registry robot a
# short trained run. Every stage under a hard timeout.
# Usage: session_followup.sh <wait_pid> [per_robot_budget_s]
set -u
WAIT_PID="${1:?wait pid}"
ROBOT_BUDGET="${2:-600}"

BASE=/root/.cache/ikflow_tpu/training_logs
MODELS=/root/.cache/ikflow_tpu/models
HERE="$(dirname "$0")"

# tail --pid exits when the PID dies and, unlike `kill -0` polling, cannot be
# fooled by PID reuse or another user's zombie (ADVICE r1).
echo "waiting on pid $WAIT_PID"
tail --pid="$WAIT_PID" -f /dev/null 2>/dev/null || true

if [ ! -f "$MODELS/panda__full.npz" ] && [ -d "$BASE/panda_full_r1/checkpoints" ]; then
    echo "=== panda export fallback from latest checkpoint ==="
    timeout 600 python "$HERE/export_from_checkpoint.py" \
        --ckpt_dir "$BASE/panda_full_r1/checkpoints" --robot_name panda \
        --nb_nodes 12 --dim_latent_space 7 --out "$MODELS/panda__full.npz"
fi

if [ -f "$MODELS/panda__full.npz" ]; then
    echo "=== bench.py trained, fp32 ==="
    timeout 900 python /root/repo/bench.py > "$BASE/panda_bench_trained_fp32.json" 2>&1
    tail -1 "$BASE/panda_bench_trained_fp32.json"
    echo "=== bench.py trained, bf16 ==="
    IKFLOW_TPU_BENCH_BF16=1 timeout 900 python /root/repo/bench.py \
        > "$BASE/panda_bench_trained_bf16.json" 2>&1
    tail -1 "$BASE/panda_bench_trained_bf16.json"
fi

train_one() {
    local robot="$1" nb="$2" dim="$3" npz="$4"
    echo "=== training $robot (budget ${ROBOT_BUDGET}s) ==="
    timeout $((ROBOT_BUDGET + 420)) python -m ikflow_tpu.cli.main train \
        --robot_name "$robot" --nb_nodes "$nb" --dim_latent_space "$dim" \
        --batch_size 4096 --learning_rate 2.5e-4 --gamma 0.9795 --step_lr_every 4883 \
        --n_steps 2000000 --on_device_data --steps_per_call 500 \
        --time_budget_s "$ROBOT_BUDGET" --dataset_size 1000000 \
        --eval_every 0 --log_every 2500 --checkpoint_every 50000 \
        --run_dir "$BASE/${robot}_r1" \
        --export "$MODELS/$npz" > "$BASE/${robot}_r1_stdout.log" 2>&1
    if [ ! -f "$MODELS/$npz" ] && [ -d "$BASE/${robot}_r1/checkpoints" ]; then
        timeout 600 python "$HERE/export_from_checkpoint.py" \
            --ckpt_dir "$BASE/${robot}_r1/checkpoints" --robot_name "$robot" \
            --nb_nodes "$nb" --dim_latent_space "$dim" --out "$MODELS/$npz"
    fi
    ls -la "$MODELS/$npz" 2>/dev/null || echo "$npz NOT exported"
}

train_one fetch_arm 16 10 fetch_arm__large.npz
train_one fetch     12 8  fetch__full.npz
train_one rizon4    12 7  rizon4__full.npz
echo "session followup done"
