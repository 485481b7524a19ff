#!/bin/bash
# Round-4 training queue (VERDICT r4 ask #4): bring every non-flagship row to
# <=20 mm. Runs AFTER the flagship decay run + measurement battery free the
# chip. All fetch runs use the DESIGN.md-prescribed stability recipe that is
# now actually implemented: global-norm gradient clipping
# (--gradient_clip_algorithm norm) + warmup + lr <= 7e-5 at batch 2048.
#
# Order: fetch__full (largest gap, 40.5 mm, unstable history) gets the most
# budget; fetch_arm (26.7 mm, only 40k steps trained) next; fetch__large
# (21.2 mm, nearly there) last and cheap.
set -u
cd /root/repo
LOGS=/root/.cache/ikflow_tpu/training_logs
W=scripts_dev/train_with_watchdog.sh

# ---- 0. Flagship continuation: the 2.2M-step decay run moved the 500x50
# protocol row 8.60 -> 8.21 mm; the local power-law slope (-0.26) puts the
# <=8.0 bar ~300k steps out. step_lr_every 120000 holds LR in the productive
# ~1.2e-5 band instead of decaying below 1e-5.
bash "$W" "$LOGS/panda_full_r2" 3000 \
    --robot_name panda --nb_nodes 12 --dim_latent_space 7 \
    --learning_rate 8.1e-5 --gamma 0.9 --step_lr_every 120000 \
    --batch_size 2048 --n_steps 2530000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 2400 \
    --export /root/repo/models/panda__full.npz --export_dtype float16 \
    --export_gate_mm 8.0
timeout 1800 python -m ikflow_tpu.cli.main evaluate \
    --model_name "panda__full__lp191_5.25m" \
    > "$LOGS/eval_flagship_r4b.log" 2>&1
grep mean_l2 "$LOGS/eval_flagship_r4b.log" || true

# ---- 1. fetch__full: resume from the r2 run's 212k-step checkpoint with the
# stability recipe. The r2 run spiked catastrophically at step 180k
# (val 2.7e8 mm) under value clipping at lr ~1e-4; norm clipping bounds the
# step length so a single bad batch cannot repeat that.
bash "$W" "$LOGS/fetch_r2" 7200 \
    --robot_name fetch --nb_nodes 12 --dim_latent_space 8 \
    --learning_rate 6e-5 --gamma 0.9 --step_lr_every 150000 --warmup_steps 0 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 1500000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 6000 \
    --export /root/repo/models/fetch__full.npz --export_dtype float16 \
    --export_gate_mm 20.0

# ---- 2. fetch_arm__large: resume from 35k steps (the 40k checkpoint is an
# incomplete .tmp). 16 blocks; the r2 run was still descending steeply.
bash "$W" "$LOGS/fetch_arm_r2" 4200 \
    --robot_name fetch_arm --nb_nodes 16 --dim_latent_space 10 \
    --learning_rate 7e-5 --gamma 0.9 --step_lr_every 120000 --warmup_steps 2000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 800000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 3300 \
    --export /root/repo/models/fetch_arm__large.npz --export_dtype float16 \
    --export_gate_mm 20.0

# ---- 3. fetch__large: final decay from 190k (val 17.3 mm falling; eval row
# 21.2). With the restored schedule count (~190k, minus the 4k warmup offset),
# gamma 0.8 / step 40000 puts LR at 1e-4*0.8^4 ~ 4.1e-5 immediately and
# ~1.3e-5 by step 400k — a polish anneal, not a restart.
bash "$W" "$LOGS/fetch_large_r3" 2700 \
    --robot_name fetch --nb_nodes 16 --dim_latent_space 8 \
    --learning_rate 1e-4 --gamma 0.8 --step_lr_every 40000 --warmup_steps 4000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 400000 --eval_every 20000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 2100 \
    --export /root/repo/models/fetch__large.npz --export_dtype float16 \
    --export_gate_mm 20.0

echo "round4_queue done"
