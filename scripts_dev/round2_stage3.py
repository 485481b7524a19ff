"""Round-2 stage 3: re-run the exact-IK battery after the kinematics/LM
precision fix (FK rotation composition + LM normal equations at
precision='highest'). Single process (one first-pull stall).

Order: 1000-pose contract, bench (XLA), bench (Pallas). Artifacts are
written next to the stage-2 ones and committed.
"""

import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

BASE = "/root/.cache/ikflow_tpu/training_logs"
REPO = "/root/repo"


def log(msg):
    print(f"[stage3 {time.strftime('%H:%M:%S', time.gmtime())}] {msg}", flush=True)


def stage(name, fn):
    log(f"=== {name} ===")
    t0 = time.time()
    try:
        fn()
        log(f"=== {name} done in {time.time() - t0:.0f}s ===")
        return True
    except Exception:
        traceback.print_exc()
        log(f"=== {name} FAILED after {time.time() - t0:.0f}s ===")
        return False


def contract():
    from tests.test_trained_contract import test_exact_ik_contract_trained_weights
    test_exact_ik_contract_trained_weights()
    log("CONTRACT PASS (1000 poses, tiers (1,3,10), 3 LM steps, 1mm/0.01rad)")
    with open(os.path.join(BASE, "contract_tpu_r2.log"), "w") as f:
        f.write("PASS (post precision fix)\n")


def run_bench(tag, env):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        cap = io.StringIO()
        stdout = sys.stdout
        sys.stdout = cap
        try:
            import importlib
            if "bench" in sys.modules:
                importlib.reload(sys.modules["bench"])
                rc = sys.modules["bench"].main()
            else:
                import bench
                rc = bench.main()
        finally:
            sys.stdout = stdout
        out = cap.getvalue()
        line = [l for l in out.splitlines() if l.strip().startswith("{")][-1]
        with open(os.path.join(BASE, f"bench_{tag}_r2_fixed.json"), "w") as f:
            f.write(line + "\n")
        log(f"bench[{tag}]: {line}")
        assert rc == 0
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    ok_contract = stage("contract 1000 poses (post-fix)", contract)
    stage("bench xla (post-fix)", lambda: run_bench("xla", {"IKFLOW_TPU_BENCH_PALLAS": "0"}))
    stage("bench pallas (post-fix)", lambda: run_bench("pallas", {"IKFLOW_TPU_BENCH_PALLAS": "1"}))

    # Commit the bench decision artifacts into the repo.
    art = {}
    for tag in ("xla", "pallas"):
        p = os.path.join(BASE, f"bench_{tag}_r2_fixed.json")
        if os.path.exists(p):
            art[tag] = json.load(open(p))
    art["contract_1000_poses"] = "PASS" if ok_contract else "FAIL"
    with open(os.path.join(REPO, "PALLAS_AB_r02.json"), "w") as f:
        json.dump(art, f, indent=1)
    os.system(
        f"cd {REPO} && git add PALLAS_AB_r02.json && "
        f"git commit -q -m 'Record post-precision-fix on-chip battery: contract + XLA-vs-Pallas bench A/B' || true"
    )
    log("stage3 complete")


if __name__ == "__main__":
    main()
