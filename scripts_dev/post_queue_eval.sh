#!/bin/bash
# Final stage after the session training queue: regenerate the registry-wide
# accuracy table (the reference's `evaluate.py --all` -> model_performances.md)
# with whatever trained weights landed, then re-run the flagship post-training
# battery. Safe to run even if some robots never exported (evaluate --all
# skips models whose weights are missing by default).
# Usage: post_queue_eval.sh <wait_pid>
set -u
WAIT_PID="${1:?wait pid}"
BASE=/root/.cache/ikflow_tpu/training_logs

echo "waiting on pid $WAIT_PID"
tail --pid="$WAIT_PID" -f /dev/null 2>/dev/null || true

echo "=== evaluate --all ==="
# evaluate appends to the performances file; move the old table aside so a
# rerun regenerates rather than accumulates duplicate rows (ADVICE r1).
PERF=/root/.cache/ikflow_tpu/model_performances.md
[ -f "$PERF" ] && mv "$PERF" "$PERF.prev"
timeout 2400 python -m ikflow_tpu.cli.main evaluate --all \
    --performances_file "$PERF" \
    > "$BASE/evaluate_all.log" 2>&1
tail -20 "$BASE/evaluate_all.log"
cat /root/.cache/ikflow_tpu/model_performances.md 2>/dev/null
echo "post queue eval done"
