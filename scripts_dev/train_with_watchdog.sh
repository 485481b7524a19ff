#!/bin/bash
# Training supervisor for flaky TPU-tunnel environments: launches ikflow-tpu
# train, watches the metrics JSONL mtime, and on a stall (no metrics for
# STALL_S seconds) kills the exact training PID and relaunches with --resume
# from the latest checkpoint. Stops when the total budget expires or the run
# completes on its own.
#
# Usage: train_with_watchdog.sh <run_dir> <total_budget_s> <train args...>
set -u

RUN_DIR="$1"; shift
TOTAL_BUDGET_S="$1"; shift
STALL_S="${STALL_S:-360}"
# A (re)launched trainer legitimately needs several minutes before its first
# metrics write: orbax restore + dataset decompress + HBM upload over the
# tunnel + XLA compile. Measured ~7 min for the 50M-param flagship with a 25M
# dataset — killing at STALL_S after launch caused an infinite restart loop
# (r2 flagship, 10:19-10:34). Until the first write after a launch, allow
# LAUNCH_GRACE_S instead of STALL_S.
LAUNCH_GRACE_S="${LAUNCH_GRACE_S:-900}"
METRICS="$RUN_DIR/metrics.jsonl"
CKPTS="$RUN_DIR/checkpoints"
START=$(date +%s)

launch() {
    local resume_args=()
    if [ -d "$CKPTS" ] && [ -n "$(ls -A "$CKPTS" 2>/dev/null)" ]; then
        resume_args=(--resume "$CKPTS")
    fi
    python -m ikflow_tpu.cli.main train "$@" --run_dir "$RUN_DIR" "${resume_args[@]}" \
        >> "$RUN_DIR/train_stdout.log" 2>&1 &
    TRAIN_PID=$!
    LAUNCH_TS=$(date +%s)
    echo "$(date -u +%H:%M:%S) launched train pid=$TRAIN_PID ${resume_args[*]:-}"
}

mkdir -p "$RUN_DIR"
launch "$@"

while true; do
    sleep 60
    NOW=$(date +%s)
    ELAPSED=$((NOW - START))
    if ! kill -0 "$TRAIN_PID" 2>/dev/null; then
        wait "$TRAIN_PID" 2>/dev/null; TRAIN_RC=$?
        RAN_S=$((NOW - LAUNCH_TS))
        # A trainer that FAILS within minutes of launch did not finish — it
        # hit a transient failure (e.g. TPU HBM still held by a dying
        # predecessor process -> instant OOM). Retry instead of declaring the
        # run done. A fast rc=0 exit is legitimate (e.g. checkpoint already at
        # n_steps: "nothing to train") and must NOT be retried.
        if [ "$TRAIN_RC" -ne 0 ] && [ "$RAN_S" -lt "${MIN_RUN_S:-300}" ] \
           && [ "${FAST_RETRIES:-0}" -lt 5 ] \
           && [ "$ELAPSED" -lt "$TOTAL_BUDGET_S" ]; then
            FAST_RETRIES=$(( ${FAST_RETRIES:-0} + 1 ))
            echo "$(date -u +%H:%M:%S) trainer exited after only ${RAN_S}s; retry $FAST_RETRIES/5 in 30s"
            sleep 30
            launch "$@"
            continue
        fi
        echo "$(date -u +%H:%M:%S) training exited on its own"
        break
    fi
    if [ "$ELAPSED" -ge "$TOTAL_BUDGET_S" ]; then
        echo "$(date -u +%H:%M:%S) budget exhausted; stopping pid $TRAIN_PID"
        kill "$TRAIN_PID" 2>/dev/null
        sleep 10
        kill -9 "$TRAIN_PID" 2>/dev/null
        break
    fi
    if [ -f "$METRICS" ]; then
        MT=$(stat -c %Y "$METRICS")
        # Progress reference = most recent of (metrics write, this launch);
        # before the first write of this launch, use the launch grace window.
        REF=$((MT > LAUNCH_TS ? MT : LAUNCH_TS))
        AGE=$((NOW - REF))
        LIMIT=$STALL_S
        [ "$MT" -le "$LAUNCH_TS" ] && LIMIT=$LAUNCH_GRACE_S
        if [ "$AGE" -ge "$LIMIT" ]; then
            echo "$(date -u +%H:%M:%S) STALL detected (metrics ${AGE}s old); restarting pid $TRAIN_PID"
            kill "$TRAIN_PID" 2>/dev/null
            sleep 10
            kill -9 "$TRAIN_PID" 2>/dev/null
            sleep 5
            launch "$@"
        fi
    fi
done
echo "$(date -u +%H:%M:%S) supervisor done"
