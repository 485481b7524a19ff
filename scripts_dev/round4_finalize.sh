#!/bin/bash
# Round-4 finalize (runs after round4_queue.sh frees the chip):
#   1. re-run the ne_highest bench leg (its first attempt died on a transient
#      tunnel remote-compile failure) and write PRECISION_AB_r04.json with
#      BOTH legs validated;
#   2. re-measure the 100k-pose megabatch with async chunk dispatch and
#      refresh MEGABATCH_r04.json;
#   3. regenerate model_performances.md (evaluate --all, 500x50 protocol);
#   4. extract the deduped flagship val curve to VAL_CURVE_r04.json.
set -u
cd /root/repo
OUT=/root/.cache/ikflow_tpu/training_logs
FAIL=0

# ---- 1. ne_highest leg rerun + A/B artifact. Up to 2 attempts: the first r4
# attempt died on a transient tunnel remote-compile failure ("response body
# closed"), which a retry survives (the XLA cache keeps the finished programs).
rc=1
for attempt in 1 2; do
    env IKFLOW_TPU_LM_NE_PRECISION=highest timeout 3600 python bench.py \
        > "$OUT/bench_ne_highest_r4.json" 2> "$OUT/bench_ne_highest_r4.err"
    rc=$?
    [ $rc -eq 0 ] && break
    echo "ne_highest attempt $attempt failed rc=$rc; $(tail -3 "$OUT/bench_ne_highest_r4.err" | head -1)"
    sleep 20
done
tail -1 "$OUT/bench_ne_highest_r4.json" || true
if [ $rc -ne 0 ]; then echo "ne_highest leg FAILED rc=$rc"; FAIL=1; fi
python - <<'PYEOF' && git add PRECISION_AB_r04.json && git commit -q -m "Round-4 NE-precision A/B artifact (both legs validated)" || FAIL=1
import json
import sys

out = {}
base = "/root/.cache/ikflow_tpu/training_logs"
for tag in ("ne_highest", "ne_default"):
    path = f"{base}/bench_{tag}_r4.json"
    with open(path) as f:
        lines = [ln for ln in f if ln.strip().startswith("{")]
    if not lines:
        print(f"ABORT: no JSON line in {path}", file=sys.stderr)
        sys.exit(1)
    leg = json.loads(lines[-1])
    if not isinstance(leg.get("value"), (int, float)):
        print(f"ABORT: leg {tag} lacks numeric value", file=sys.stderr)
        sys.exit(1)
    out[tag] = leg
out["decision"] = (
    "KEEP precision='highest' on the LM normal-equation einsums: the default-"
    "precision leg is ~30% slower end-to-end because tier-1 validity drops "
    "(845 vs 894+/1000) and the widened retry capacities swamp the per-op "
    "saving. See docs/DESIGN.md."
)
with open("PRECISION_AB_r04.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote PRECISION_AB_r04.json (2 valid legs)")
PYEOF

# ---- 2. Megabatch with async dispatch.
timeout 3600 python -m ikflow_tpu.cli.main benchmark \
    --model_name "panda__full__lp191_5.25m" --megabatch 100000 --chunk_size 8192 \
    > "$OUT/megabatch_async_r4.json" 2> "$OUT/megabatch_async_r4.err" \
    || { echo "megabatch FAILED"; FAIL=1; }
python - <<'PYEOF' && git add MEGABATCH_r04.json && git commit -q -m "Round-4 megabatch artifact refreshed with async chunk dispatch" || FAIL=1
import json
import sys

with open("/root/.cache/ikflow_tpu/training_logs/megabatch_async_r4.json") as f:
    lines = [ln for ln in f if ln.strip().startswith("{")]
if not lines:
    print("ABORT: megabatch produced no JSON", file=sys.stderr)
    sys.exit(1)
row = json.loads(lines[-1])
if "sols_per_s" not in row:
    print("ABORT: megabatch row lacks sols_per_s", file=sys.stderr)
    sys.exit(1)
row["dispatch"] = "async (probe chunk blocks; capped chunks enqueued without sync)"
with open("MEGABATCH_r04.json", "w") as f:
    json.dump(row, f, indent=1)
print(f"wrote MEGABATCH_r04.json: {row['sols_per_s']} sols/s")
PYEOF

# ---- 3. Full performances table.
timeout 5400 python -m ikflow_tpu.cli.main evaluate --all \
    > "$OUT/evaluate_all_r4.log" 2>&1 || { echo "evaluate --all FAILED"; FAIL=1; }
tail -3 "$OUT/evaluate_all_r4.log"

# ---- 4. Flagship val curve (deduped, monotone).
python scripts_dev/extract_val_curve.py \
    "$OUT/panda_full_r2/metrics.jsonl" /root/repo/VAL_CURVE_r04.json || FAIL=1

git add model_performances.md VAL_CURVE_r04.json 2>/dev/null \
    && git commit -q -m "Round-4 performances table + flagship val curve" || true

echo "round4_finalize done (FAIL=$FAIL)"
exit $FAIL
