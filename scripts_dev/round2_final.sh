#!/bin/bash
# Round-2 stage 4: once all training queues finish and the chip is idle,
# run the perf/quality battery with trained flagship weights:
#   1. XLA-vs-Pallas inference A/B (the round-1 verdict demanded a decision
#      backed by an on-chip artifact) -> PALLAS_AB_r02.json
#   2. bench.py with IKFLOW_TPU_BENCH_PALLAS=1 and default -> BENCH JSON logs
#   3. the 1000-pose exact-IK contract on the real chip (plain python, not
#      pytest, so the CPU-forcing test conftest does not apply)
# Commits the artifacts.
# Usage: round2_final.sh <wait_pid>
set -u
WAIT_PID="${1:?wait pid}"
BASE=/root/.cache/ikflow_tpu/training_logs
HERE="$(dirname "$0")"
cd /root/repo

echo "waiting on pid $WAIT_PID"
tail --pid="$WAIT_PID" -f /dev/null 2>/dev/null || true

echo "=== inference A/B (xla vs pallas) ==="
timeout 1800 python /root/repo/analysis/inference_optimization.py \
    --batch_sizes 1024 8192 32768 > "$BASE/pallas_ab_r2.log" 2>&1 || true
grep -h "{" "$BASE/pallas_ab_r2.log" | tail -20

echo "=== bench.py pallas ==="
IKFLOW_TPU_BENCH_PALLAS=1 timeout 1800 python /root/repo/bench.py \
    > "$BASE/bench_pallas_r2.json" 2>&1 || true
tail -1 "$BASE/bench_pallas_r2.json"

echo "=== bench.py default (xla) ==="
timeout 1800 python /root/repo/bench.py > "$BASE/bench_xla_r2.json" 2>&1 || true
tail -1 "$BASE/bench_xla_r2.json"

echo "=== contract on TPU ==="
timeout 1800 python - > "$BASE/contract_tpu_r2.log" 2>&1 <<'EOF'
from tests.test_trained_contract import test_exact_ik_contract_trained_weights
test_exact_ik_contract_trained_weights()
print("CONTRACT PASS (1000 poses, tiers (1,3,10), 3 LM steps, 1mm/0.01rad)")
EOF
tail -2 "$BASE/contract_tpu_r2.log"

python - <<'EOF'
import json, os
base = "/root/.cache/ikflow_tpu/training_logs"
out = {"note": "round-2 on-chip perf battery with trained flagship weights"}
for name, f in [("bench_xla", "bench_xla_r2.json"), ("bench_pallas", "bench_pallas_r2.json")]:
    try:
        lines = [l for l in open(os.path.join(base, f)) if l.strip().startswith("{")]
        out[name] = json.loads(lines[-1])
    except Exception as e:
        out[name] = f"unavailable: {e}"
rows = []
try:
    for l in open(os.path.join(base, "pallas_ab_r2.log")):
        l = l.strip()
        if l.startswith("{"):
            rows.append(json.loads(l))
except Exception:
    pass
out["inference_ab_rows"] = rows
try:
    out["contract"] = open(os.path.join(base, "contract_tpu_r2.log")).read().strip().splitlines()[-1]
except Exception:
    out["contract"] = "unavailable"
with open("/root/repo/PALLAS_AB_r02.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote PALLAS_AB_r02.json")
EOF
(cd /root/repo && git add PALLAS_AB_r02.json && \
 git commit -m "Record on-chip perf battery: XLA-vs-Pallas A/B, trained bench runs, exact-IK contract result") || true
echo "round2 final battery done"
