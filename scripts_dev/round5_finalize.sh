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

# Refuse to run while a trainer still owns the chip. Match only real python
# trainer processes (argv[0] is a python binary AND the module is the train
# CLI) — a substring grep over every cmdline also matches unrelated shells
# that merely *mention* the trainer (e.g. an orchestrator that launched this
# script, or a monitoring one-liner), which dead-locked the first finalize.
for p in /proc/[0-9]*/cmdline; do
  c=$(tr "\0" " " < "$p" 2>/dev/null) || continue
  case "$c" in
    python*"ikflow_tpu.cli.main train"*|*/python*"ikflow_tpu.cli.main train"*)
      echo "a trainer is still running ($(basename "$(dirname "$p")")) — not contending for the chip"
      exit 1;;
  esac
done

timeout 3600 python -m ikflow_tpu.cli.main evaluate --all \
    > "$LOGS/eval_all_r5.log" 2>&1
tail -3 "$LOGS/eval_all_r5.log"

python scripts_dev/extract_val_curve.py \
    "$LOGS/sigmoid_full_r5/metrics.jsonl" /root/repo/VAL_CURVE_r05.json
echo "finalize done"
