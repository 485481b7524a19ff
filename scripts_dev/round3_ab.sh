#!/bin/bash
# Round-3 measurement battery (run AFTER the training queue frees the chip):
#   1. NE-precision A/B (VERDICT r3 #8): bench with normal-equation einsums at
#      "highest" (current default) vs "default" — FK stays pinned highest.
#   2. XLA-vs-Pallas A/B re-record with the hardened harness (VERDICT r3 #2).
#   3. Exact-IK runtime curve over batch sizes (VERDICT r3 #5), differencing
#      methodology, written to RUNTIME_CURVE_r03.json.
# Each leg is a separate process (env-gated program variants); bench.py now
# refuses degenerate measurements, so a failed leg exits nonzero with no JSON.
set -u
cd /root/repo
OUT=${OUT:-/root/.cache/ikflow_tpu/training_logs}

run_bench() {  # run_bench <tag> [env pairs...]
    local tag="$1"; shift
    echo "=== bench leg: $tag ($*)"
    env "$@" timeout 1800 python bench.py > "$OUT/bench_$tag.json" 2> "$OUT/bench_$tag.err"
    local rc=$?
    tail -1 "$OUT/bench_$tag.json" || true
    [ $rc -ne 0 ] && echo "LEG $tag FAILED rc=$rc ($(tail -2 "$OUT/bench_$tag.err" | head -1))"
    return 0
}

# ---- 1. NE precision A/B.
run_bench ne_highest IKFLOW_TPU_LM_NE_PRECISION=highest
run_bench ne_default IKFLOW_TPU_LM_NE_PRECISION=default
python - <<'EOF'
import json
out = {}
base = "/root/.cache/ikflow_tpu/training_logs"
for tag in ("ne_highest", "ne_default"):
    try:
        with open(f"{base}/bench_{tag}.json") as f:
            line = [l for l in f if l.strip().startswith("{")][-1]
        out[tag] = json.loads(line)
    except Exception as e:
        out[tag] = {"error": str(e)}
with open("PRECISION_AB_r03.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote PRECISION_AB_r03.json")
EOF
git add PRECISION_AB_r03.json && git commit -q -m "Round-3 NE-precision A/B artifact" || true

# ---- 2. XLA vs Pallas A/B. The ne_highest leg above IS the current-default
# XLA leg — reuse it rather than re-measuring the same program.
cp "$OUT/bench_ne_highest.json" "$OUT/bench_xla_r3.json"
run_bench pallas_r3 IKFLOW_TPU_BENCH_PALLAS=1
# Candidate throughput config: bf16 hidden matmuls for the seed pass.
run_bench bf16_r3 IKFLOW_TPU_BENCH_BF16=1
python - <<'EOF'
import json
out = {}
base = "/root/.cache/ikflow_tpu/training_logs"
for tag, key in (("xla_r3", "xla"), ("pallas_r3", "pallas"), ("bf16_r3", "xla+bf16")):
    try:
        with open(f"{base}/bench_{tag}.json") as f:
            line = [l for l in f if l.strip().startswith("{")][-1]
        out[key] = json.loads(line)
    except Exception as e:
        out[key] = {"error": str(e)}
with open("PALLAS_AB_r03.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote PALLAS_AB_r03.json")
EOF
git add PALLAS_AB_r03.json && git commit -q -m "Round-3 XLA-vs-Pallas A/B artifact (hardened harness)" || true

# ---- 2b. Serving-scale streaming solve (fleet megabatch, 100k poses).
timeout 1500 python -m ikflow_tpu.cli.main benchmark \
    --model_name "panda__full__lp191_5.25m" --megabatch 100000 --chunk_size 8192 \
    > "$OUT/megabatch_r3.json" 2> "$OUT/megabatch_r3.err"
tail -1 "$OUT/megabatch_r3.json" || true

# ---- 3. Exact-IK runtime curve (reference headline artifact).
timeout 3000 python -m ikflow_tpu.cli.main benchmark \
    --model_name "panda__full__lp191_5.25m" --mode exact --differencing \
    --batch_sizes 1 10 100 1000 10000 \
    > "$OUT/runtime_curve_r3.jsonl" 2> "$OUT/runtime_curve_r3.err"
python - <<'EOF'
import json
rows = []
with open("/root/.cache/ikflow_tpu/training_logs/runtime_curve_r3.jsonl") as f:
    for line in f:
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
mega = None
try:
    with open("/root/.cache/ikflow_tpu/training_logs/megabatch_r3.json") as f:
        for line in f:
            if line.strip().startswith("{"):
                mega = json.loads(line)
except Exception:
    pass
payload = {
    "protocol": "exact IK, tiers (1,3,10), <=3 LM steps, 1mm/0.572deg, "
                "latent scale 0.75, chained-scan differencing (device time)",
    "reference_anchor": "benchmark_generate_exact_solutions.py:145-151 "
                        "(CUDA n=1000: 4237 sols/s)",
    "rows": rows,
    "megabatch_serving": mega,
}
with open("RUNTIME_CURVE_r03.json", "w") as f:
    json.dump(payload, f, indent=1)
print(f"wrote RUNTIME_CURVE_r03.json with {len(rows)} rows")
EOF

git add RUNTIME_CURVE_r03.json 2>/dev/null
git commit -q -m "Round-3 exact-IK runtime curve artifact" || true
echo "round3_ab done"
