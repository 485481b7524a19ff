#!/bin/bash
# Crash insurance for the flagship training run (VERDICT r2 next-#1: "commit
# periodic checkpoint exports so a machine reset can't eat the run a third
# time"). Every INTERVAL_S, snapshot the newest finalized orbax checkpoint
# (copy first — keep-3 GC at the 20k-step cadence deletes a step ~5 min after
# it stops being latest), export it to the repo deploy artifact on CPU, and
# commit. Stops when the supervisor PID exits.
set -u
cd /root/repo

SUPERVISOR_PID="$1"
CKPTS=/root/.cache/ikflow_tpu/training_logs/panda_full_r2/checkpoints
INTERVAL_S="${INTERVAL_S:-2700}"

while kill -0 "$SUPERVISOR_PID" 2>/dev/null; do
    sleep "$INTERVAL_S"
    kill -0 "$SUPERVISOR_PID" 2>/dev/null || break
    STEP=$(ls "$CKPTS" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    [ -n "$STEP" ] || continue
    SNAP=$(mktemp -d)
    if cp -r "$CKPTS/$STEP" "$SNAP/$STEP" 2>/dev/null; then
        if python scripts_dev/export_from_checkpoint.py --ckpt_dir "$SNAP" \
              --robot_name panda --out /root/repo/models/panda__full.npz \
              --nb_nodes 12 --dim_latent_space 7 --dtype float16; then
            git add models/panda__full.npz && \
                git commit -q -m "models: flagship checkpoint export at step $STEP (periodic)" && \
                echo "$(date -u +%H:%M:%S) committed flagship export @ $STEP"
        fi
    fi
    rm -rf "$SNAP"
done
echo "$(date -u +%H:%M:%S) periodic export loop done"
