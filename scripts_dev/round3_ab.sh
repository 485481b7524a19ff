#!/bin/bash
# Round-3 measurement battery (runs after the training queue frees the chip).
# Ordered by VERDICT r3 priority so a round-end truncation costs the least
# important legs: (1) baseline bench -> (2) Pallas A/B [#2] -> (3) runtime
# curve [#5] -> (4) NE-precision A/B [#8] -> (5) bf16 candidate -> (6)
# serving megabatch. Each artifact commits as soon as it exists. bench.py
# refuses degenerate measurements (exits nonzero, no JSON).
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

# ---- 1. Baseline (current defaults: XLA, NE precision "highest").
run_bench ne_highest IKFLOW_TPU_LM_NE_PRECISION=highest

# ---- 2. Pallas leg + A/B artifact (baseline doubles as the XLA leg).
run_bench pallas_r3 IKFLOW_TPU_BENCH_PALLAS=1
python - <<'PYEOF'
import json
out = {}
base = "/root/.cache/ikflow_tpu/training_logs"
for tag, key in (("ne_highest", "xla"), ("pallas_r3", "pallas")):
    try:
        with open(f"{base}/bench_{tag}.json") as f:
            line = [l for l in f if l.strip().startswith("{")][-1]
        out[key] = json.loads(line)
    except Exception as e:
        out[key] = {"error": str(e)}
with open("PALLAS_AB_r03.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote PALLAS_AB_r03.json")
PYEOF
git add PALLAS_AB_r03.json && git commit -q -m "Round-3 XLA-vs-Pallas A/B artifact (hardened harness)" || true

# ---- 3. Exact-IK runtime curve (reference headline artifact).
timeout 2400 python -m ikflow_tpu.cli.main benchmark \
    --model_name "panda__full__lp191_5.25m" --mode exact --differencing \
    --batch_sizes 1 10 100 1000 5000 \
    > "$OUT/runtime_curve_r3.jsonl" 2> "$OUT/runtime_curve_r3.err"
python - <<'PYEOF'
import json
rows = []
with open("/root/.cache/ikflow_tpu/training_logs/runtime_curve_r3.jsonl") as f:
    for line in f:
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
payload = {
    "protocol": "exact IK, tiers (1,3,10), <=3 LM steps, 1mm/0.572deg, "
                "latent scale 0.75, chained-scan differencing (device time)",
    "reference_anchor": "benchmark_generate_exact_solutions.py:145-151 "
                        "(CUDA n=1000: 4237 sols/s)",
    "rows": rows,
}
with open("RUNTIME_CURVE_r03.json", "w") as f:
    json.dump(payload, f, indent=1)
print(f"wrote RUNTIME_CURVE_r03.json with {len(rows)} rows")
PYEOF
git add RUNTIME_CURVE_r03.json && git commit -q -m "Round-3 exact-IK runtime curve artifact" || true

# ---- 4. NE-precision A/B (FK stays pinned highest; see lm.py).
run_bench ne_default IKFLOW_TPU_LM_NE_PRECISION=default
python - <<'PYEOF'
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
PYEOF
git add PRECISION_AB_r03.json && git commit -q -m "Round-3 NE-precision A/B artifact" || true

# ---- 5. bf16 hidden-matmul candidate.
run_bench bf16_r3 IKFLOW_TPU_BENCH_BF16=1

# ---- 6. Serving-scale streaming solve (fleet megabatch, 100k poses).
timeout 1500 python -m ikflow_tpu.cli.main benchmark \
    --model_name "panda__full__lp191_5.25m" --megabatch 100000 --chunk_size 8192 \
    > "$OUT/megabatch_r3.json" 2> "$OUT/megabatch_r3.err"
tail -1 "$OUT/megabatch_r3.json" || true

echo "round3_ab done"
