#!/bin/bash
# Round-3 finalization (run after round3_ab.sh): regenerate the performances
# table over all shipped models, extract the flagship val curve, and commit.
set -u
cd /root/repo

echo "=== evaluate --all"
timeout 3600 python -m ikflow_tpu.cli.main evaluate --all \
    --performances_file model_performances.md \
    2> /root/.cache/ikflow_tpu/training_logs/evaluate_all_r3.err \
    | tee /root/.cache/ikflow_tpu/training_logs/evaluate_all_r3.log | tail -3

echo "=== val curve"
python scripts_dev/extract_val_curve.py \
    /root/.cache/ikflow_tpu/training_logs/panda_full_r2/metrics.jsonl \
    /root/repo/VAL_CURVE_r03.json

git add model_performances.md VAL_CURVE_r03.json
git commit -q -m "Round-3 evaluation: regenerated model_performances.md + flagship val curve" || true
echo "finalize done"
