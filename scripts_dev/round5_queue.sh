#!/bin/bash
# Round-5 training queue (VERDICT r4 asks #3 and #4):
#
# 1. Flagship-class sigmoid model (panda__full_sigmoid, 12 blocks): grown
#    from the shipped 6-block panda__lite_sigmoid via zero-init identity
#    couplings (scripts_dev/grow_flow_init.py — exactly NLL-preserving, so
#    training starts from the lite model's 16.19 mm val instead of scratch),
#    then annealed with the measured norm-clip recipe.
# 2. rizon4: the table's worst row (9.74 deg mean angular at 200k steps) —
#    warm-start from the shipped artifact, ~1M further steps.
# 3. fetch__large: 16-block at 380k steps — polish anneal.
#
# NO GATE VALUES HERE (round-5 centralization): every export resolves its
# quality gate from model_descriptions.yaml's export_gate_mm + the
# no-regression rule (training/checkpoints.py::resolve_export_gate).
set -u
cd /root/repo
LOGS=/root/.cache/ikflow_tpu/training_logs
W=scripts_dev/train_with_watchdog.sh
CACHE=/root/.cache/ikflow_tpu
mkdir -p "$LOGS"

# ---- 0. Grown sigmoid warm-start init (CPU; deterministic, cheap).
GROW_INIT=$CACHE/panda__full_sigmoid_grow_init.npz
JAX_PLATFORMS=cpu python scripts_dev/grow_flow_init.py \
    models/panda__lite_sigmoid.npz "$GROW_INIT" 12 || exit 1

# ---- 1. Sigmoid flagship: 12 blocks, bounded output head. LR per the
# DESIGN.md rule (>=4e-5 until the final decay at this batch size); warmup
# eases the zero-init blocks in; norm clipping guards deep-stack spikes.
bash "$W" "$LOGS/sigmoid_full_r5" 5100 \
    --robot_name panda --nb_nodes 12 --dim_latent_space 7 \
    --sigmoid_on_output --disable_softflow \
    --init_npz "$GROW_INIT" \
    --learning_rate 8e-5 --gamma 0.9 --step_lr_every 120000 --warmup_steps 2000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 1500000 --eval_every 10000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 4800 \
    --export /root/repo/models/panda__full_sigmoid.npz --export_dtype float16

# ---- 2. rizon4: warm-start anneal from the shipped 200k-step artifact.
bash "$W" "$LOGS/rizon4_r5" 4200 \
    --robot_name rizon4 --nb_nodes 12 --dim_latent_space 7 \
    --init_npz /root/repo/models/rizon4__full.npz \
    --learning_rate 8e-5 --gamma 0.9 --step_lr_every 120000 --warmup_steps 1000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 1000000 --eval_every 10000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 3900 \
    --export /root/repo/models/rizon4__full.npz --export_dtype float16

# ---- 3. fetch__large: polish anneal from 380k steps (val 10.16 mm).
bash "$W" "$LOGS/fetch_large_r5" 2400 \
    --robot_name fetch --nb_nodes 16 --dim_latent_space 8 \
    --init_npz /root/repo/models/fetch__large.npz \
    --learning_rate 5e-5 --gamma 0.85 --step_lr_every 60000 --warmup_steps 2000 \
    --gradient_clip_algorithm norm --gradient_clip_val 1.0 \
    --batch_size 2048 --n_steps 500000 --eval_every 10000 --log_every 2500 \
    --checkpoint_every 20000 --on_device_data --steps_per_call 500 \
    --dataset_size 25000000 --time_budget_s 2100 \
    --export /root/repo/models/fetch__large.npz --export_dtype float16

echo "round5_queue done"
