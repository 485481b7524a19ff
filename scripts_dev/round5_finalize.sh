#!/bin/bash
# Round-5 finalize: runs after round5_queue.sh frees the chip.
#
# 1. Regenerate model_performances.md with `evaluate --all` (picks up the new
#    panda__full_sigmoid row and the round-5 solution-diversity column).
# 2. Extract the sigmoid-flagship validation curve into VAL_CURVE_r05.json.
#
# No gate values here — exports already ran inside the queue under the
# central policy (model_descriptions.yaml + resolve_export_gate).
set -u
cd /root/repo
LOGS=/root/.cache/ikflow_tpu/training_logs

# Refuse to run while a trainer still owns the chip.
if ls /proc/*/cmdline 2>/dev/null | xargs -I{} sh -c 'tr "\0" " " < {} 2>/dev/null' \
    | grep -q "ikflow_tpu.cli.main train"; then
  echo "a trainer is still running — not contending for the chip"; exit 1
fi

timeout 3600 python -m ikflow_tpu.cli.main evaluate --all \
    > "$LOGS/eval_all_r5.log" 2>&1
tail -3 "$LOGS/eval_all_r5.log"

python scripts_dev/extract_val_curve.py \
    "$LOGS/sigmoid_full_r5/metrics.jsonl" /root/repo/VAL_CURVE_r05.json
echo "finalize done"
