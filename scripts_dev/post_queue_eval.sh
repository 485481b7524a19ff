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

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done

echo "=== evaluate --all ==="
timeout 2400 python -m ikflow_tpu.cli.main evaluate --all \
    --performances_file /root/.cache/ikflow_tpu/model_performances.md \
    > "$BASE/evaluate_all.log" 2>&1
tail -20 "$BASE/evaluate_all.log"
cat /root/.cache/ikflow_tpu/model_performances.md 2>/dev/null
echo "post queue eval done"
