#!/bin/bash
# Round-3 training queue (trimmed variant B): runs after the flagship EXTENSION
# supervisor exits. Drops the fetch_arm boost to pay for +35 min of flagship.
# Order (VERDICT r3 priorities): fetch__large retrain with a stable recipe
# (#3), then boosts for rizon4/panda_lite/fetch_full (#6; fetch_arm dropped to fund the flagship extension), then the
# sigmoid-head validation model (#9). Each run goes through the watchdog
# supervisor and exports a quality-gated deploy artifact, committed on success.
set -u
cd /root/repo

LOGS=/root/.cache/ikflow_tpu/training_logs
WD=scripts_dev/train_with_watchdog.sh
FLAGSHIP_SUPERVISOR_PID="${1:-}"

if [ -n "$FLAGSHIP_SUPERVISOR_PID" ]; then
    echo "$(date -u +%H:%M:%S) waiting for flagship supervisor pid $FLAGSHIP_SUPERVISOR_PID"
    while kill -0 "$FLAGSHIP_SUPERVISOR_PID" 2>/dev/null; do sleep 60; done
    echo "$(date -u +%H:%M:%S) flagship done"
fi

commit_model() {  # commit_model <npz> <msg>
    if [ -f "$1" ]; then
        git add "$1" && git commit -q -m "$2" && echo "committed: $2"
    else
        echo "SKIP commit: $1 missing"
    fi
}

# Fallback export if the watchdog killed the trainer before its --export step.
# Runs on CPU and honors the same quality gate via --gate_mm (reads the run's
# last val/l2_error_mm), so a refusal by the trainer's gate cannot be
# bypassed by the fallback path.
fallback_export() {  # fallback_export <ckpt_dir> <robot> <out> <nb> <dls> <gate_mm>
    python scripts_dev/export_from_checkpoint.py --ckpt_dir "$1" --robot_name "$2" \
        --out "$3" --nb_nodes "$4" --dim_latent_space "$5" --dtype float16 --gate_mm "$6"
}

# ---- 1. fetch__large: fresh retrain, stabilized (warmup + lower peak LR).
RUN=$LOGS/fetch_large_r3
bash "$WD" "$RUN" 2700 \
    --robot_name fetch --nb_nodes 16 --dim_latent_space 8 \
    --optimizer adamw --learning_rate 1e-4 --warmup_steps 4000 \
    --gamma 0.93 --step_lr_every 100000 --batch_size 2048 \
    --n_steps 2000000 --eval_every 10000 --log_every 2500 --checkpoint_every 10000 \
    --on_device_data --steps_per_call 500 --time_budget_s 2400 \
    --dataset_size 25000000 \
    --export /root/repo/models/fetch__large.npz --export_dtype float16 --export_gate_mm 50
[ -n "$(find /root/repo/models/fetch__large.npz -newermt '-1 hour' 2>/dev/null)" ] || \
    fallback_export "$RUN/checkpoints" fetch /root/repo/models/fetch__large.npz 16 8 50
commit_model models/fetch__large.npz "models: retrained fetch__large (warmup + stable LR recipe)"

# ---- 2. rizon4 boost (resume r2 checkpoint, continued LR).
RUN=$LOGS/patch_rizon4__full
bash "$WD" "$RUN" 1300 \
    --robot_name rizon4 --nb_nodes 12 --dim_latent_space 7 \
    --optimizer adamw --learning_rate 1.6e-4 --gamma 0.93 --step_lr_every 100000 \
    --batch_size 2048 --n_steps 2000000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 --time_budget_s 1150 \
    --dataset_size 25000000 \
    --export /root/repo/models/rizon4__full.npz --export_dtype float16 --export_gate_mm 30
[ -n "$(find /root/repo/models/rizon4__full.npz -newermt '-1 hour' 2>/dev/null)" ] || \
    fallback_export "$RUN/checkpoints" rizon4 /root/repo/models/rizon4__full.npz 12 7 30
commit_model models/rizon4__full.npz "models: boosted rizon4__full training"

# ---- 3. panda_lite boost.
RUN=$LOGS/panda_lite_r2
bash "$WD" "$RUN" 1300 \
    --robot_name panda --nb_nodes 6 --dim_latent_space 7 \
    --optimizer adamw --learning_rate 1.8e-4 --gamma 0.93 --step_lr_every 100000 \
    --batch_size 2048 --n_steps 2000000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 --time_budget_s 1150 \
    --dataset_size 25000000 \
    --export /root/repo/models/panda__lite.npz --export_dtype float16 --export_gate_mm 30
[ -n "$(find /root/repo/models/panda__lite.npz -newermt '-1 hour' 2>/dev/null)" ] || \
    fallback_export "$RUN/checkpoints" panda /root/repo/models/panda__lite.npz 6 7 30
commit_model models/panda__lite.npz "models: boosted panda__lite training"

# ---- 4. fetch_full boost.
RUN=$LOGS/fetch_r2
bash "$WD" "$RUN" 1300 \
    --robot_name fetch --nb_nodes 12 --dim_latent_space 8 \
    --optimizer adamw --learning_rate 1.2e-4 --gamma 0.93 --step_lr_every 100000 \
    --batch_size 2048 --n_steps 2000000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 --time_budget_s 1150 \
    --dataset_size 25000000 \
    --export /root/repo/models/fetch__full.npz --export_dtype float16 --export_gate_mm 40
[ -n "$(find /root/repo/models/fetch__full.npz -newermt '-1 hour' 2>/dev/null)" ] || \
    fallback_export "$RUN/checkpoints" fetch /root/repo/models/fetch__full.npz 12 8 40
commit_model models/fetch__full.npz "models: boosted fetch__full training"

# ---- 6. sigmoid-head validation model (fresh).
RUN=$LOGS/panda_lite_sigmoid_r3
bash "$WD" "$RUN" 950 \
    --robot_name panda --nb_nodes 6 --dim_latent_space 7 --sigmoid_on_output --disable_softflow \
    --optimizer adamw --learning_rate 1e-4 --warmup_steps 1000 \
    --gamma 0.93 --step_lr_every 100000 --batch_size 2048 \
    --n_steps 2000000 --eval_every 10000 --log_every 2500 --checkpoint_every 10000 \
    --on_device_data --steps_per_call 500 --time_budget_s 800 \
    --dataset_size 25000000 \
    --export /root/repo/models/panda__lite_sigmoid.npz --export_dtype float16 --export_gate_mm 100
[ -n "$(find /root/repo/models/panda__lite_sigmoid.npz -newermt '-1 hour' 2>/dev/null)" ] || \
    python scripts_dev/export_from_checkpoint.py --ckpt_dir "$RUN/checkpoints" \
        --robot_name panda --out /root/repo/models/panda__lite_sigmoid.npz \
        --nb_nodes 6 --dim_latent_space 7 --dtype float16 --sigmoid_on_output --gate_mm 100
commit_model models/panda__lite_sigmoid.npz "models: sigmoid-head panda lite (bounded-output validation)"

echo "$(date -u +%H:%M:%S) round3 queue done"
