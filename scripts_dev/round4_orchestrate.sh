#!/bin/bash
# Round-4 chip orchestrator: waits for the flagship decay run's supervisor to
# finish, then runs (1) flagship eval-protocol check, (2) the measurement
# battery (round4_measure.sh), (3) the fetch training queue (round4_queue.sh).
# Keeps the single TPU chip busy end-to-end; each stage logs separately.
set -u
cd /root/repo
LOGS=/root/.cache/ikflow_tpu/training_logs

# Wait for the flagship supervisor (train_with_watchdog on panda_full_r2).
while pgrep -f "train_with_watchdog.sh /root/.cache/ikflow_tpu/training_logs/panda_full_r2" > /dev/null; do
    sleep 60
done
echo "$(date -u +%H:%M:%S) flagship supervisor finished"
sleep 30  # let the dying trainer release TPU HBM

# Stage 1: flagship row at the reference eval protocol (500x50, scale 0.75).
timeout 2400 python -m ikflow_tpu.cli.main evaluate \
    --model_name "panda__full__lp191_5.25m" \
    > "$LOGS/eval_flagship_r4.log" 2>&1
echo "$(date -u +%H:%M:%S) flagship evaluate done (rc=$?)"
tail -12 "$LOGS/eval_flagship_r4.log"

# Stage 2: measurement battery (NE A/B, curves, megabatch) — commits artifacts.
bash scripts_dev/round4_measure.sh > "$LOGS/round4_measure.log" 2>&1
echo "$(date -u +%H:%M:%S) measurement battery done (rc=$?)"

# Stage 3: fetch training queue.
bash scripts_dev/round4_queue.sh > "$LOGS/round4_queue.log" 2>&1
echo "$(date -u +%H:%M:%S) training queue done (rc=$?)"
