"""Round-2 stage 2: flagship boost + full artifact battery in ONE process.

Why one process: on this tunneled TPU every fresh process pays a ~5-minute
stall on its first device->host transfer (measured 291 s for a 4-byte pull,
then 26 MB/s); merging the boost run, evaluate --all, both bench runs and the
contract test into a single process pays it once.

Stages (each wrapped so a failure doesn't kill the rest):
  1. Resume panda__full from its checkpoint and train until --train_until
     (unix ts), then export fp16 over models/panda__full.npz.
  2. evaluate --all -> model_performances.md (old file moved aside: the
     writer appends).
  3. bench.py (XLA) and bench.py (Pallas) -> JSON artifacts.
  4. 1000-pose trained-weights exact-IK contract.

Usage: python scripts_dev/round2_stage2.py --train_until <unix_ts>
"""

import argparse
import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

BASE = "/root/.cache/ikflow_tpu/training_logs"
RUN_DIR = os.path.join(BASE, "panda_full_r2")
REPO = "/root/repo"


def log(msg):
    print(f"[stage2 {time.strftime('%H:%M:%S', time.gmtime())}] {msg}", flush=True)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_until", type=float, required=True,
                    help="unix ts: train the flagship until this time, then run the battery")
    ap.add_argument("--skip_boost", action="store_true")
    args = ap.parse_args()

    from ikflow_tpu.cli.main import main as cli_main

    # Patch stage: any registry entry whose deploy artifact is still missing
    # (a watchdog-budgeted stage can die entirely inside the per-process
    # overhead) gets a short in-process run — no extra first-pull stall here.
    def patch_missing():
        import yaml

        with open(os.path.join(REPO, "ikflow_tpu", "model_descriptions.yaml")) as f:
            entries = yaml.safe_load(f)
        for name, e in entries.items():
            npz = os.path.join(REPO, "models", e["weights_path"])
            if os.path.exists(npz):
                continue
            run = os.path.join(BASE, f"patch_{os.path.basename(npz)[:-4]}")
            log(f"patching missing {e['weights_path']} ({e['robot_name']})")
            rc = cli_main([
                "train", "--robot_name", e["robot_name"],
                "--nb_nodes", str(e["nb_nodes"]),
                "--dim_latent_space", str(e["dim_latent_space"]),
                "--batch_size", "2048", "--learning_rate", "2e-4",
                "--gamma", "0.88", "--step_lr_every", "12000",
                "--n_steps", "2000000", "--on_device_data",
                "--steps_per_call", "500", "--time_budget_s", "300",
                "--eval_every", "10000", "--log_every", "2500",
                "--checkpoint_every", "10000", "--dataset_size", "5000000",
                "--run_dir", run,
                "--export", npz, "--export_dtype", "float16",
            ])
            if rc == 0 and os.path.exists(npz):
                os.system(
                    f"cd {REPO} && git add models/{e['weights_path']} && "
                    f"git commit -q -m 'models: add trained {e['weights_path'][:-4]} deploy weights' || true"
                )

    stage("patch missing models", patch_missing)

    if not args.skip_boost:
        budget = max(args.train_until - time.time(), 120.0)
        log(f"flagship boost budget: {budget:.0f}s")

        def boost():
            ckpts = os.path.join(RUN_DIR, "checkpoints")
            resume = ["--resume", ckpts] if os.path.isdir(ckpts) and os.listdir(ckpts) else []
            rc = cli_main([
                "train", "--robot_name", "panda", "--nb_nodes", "12",
                "--dim_latent_space", "7", "--batch_size", "2048",
                "--learning_rate", "2e-4", "--gamma", "0.88",
                "--step_lr_every", "12000", "--n_steps", "2000000",
                "--on_device_data", "--steps_per_call", "500",
                "--time_budget_s", str(int(budget)),
                "--eval_every", "20000", "--log_every", "2500",
                "--checkpoint_every", "20000",
                "--dataset_size", "25000000",
                "--run_dir", RUN_DIR, *resume,
                "--export", os.path.join(REPO, "models", "panda__full.npz"),
                "--export_dtype", "float16",
            ])
            assert rc == 0, f"train rc={rc}"
            os.system(
                f"cd {REPO} && git add models/panda__full.npz && "
                f"git commit -q -m 'models: flagship panda__full boosted weights' || true"
            )

        stage("flagship boost", boost)

    def eval_all():
        perf = os.path.join(REPO, "model_performances.md")
        if os.path.exists(perf):
            os.replace(perf, perf + ".prev")
        rc = cli_main(["evaluate", "--all", "--performances_file", perf])
        assert rc == 0 and os.path.exists(perf)
        os.system(
            f"cd {REPO} && git add model_performances.md && "
            f"git commit -q -m 'Add registry-wide accuracy table (evaluate --all, round-2 weights)' || true"
        )

    stage("evaluate --all", eval_all)

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
            path = os.path.join(BASE, f"bench_{tag}_r2.json")
            with open(path, "w") as f:
                f.write(line + "\n")
            log(f"bench[{tag}]: {line}")
            assert rc == 0
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def contract():
        from tests.test_trained_contract import test_exact_ik_contract_trained_weights
        test_exact_ik_contract_trained_weights()
        log("CONTRACT PASS (1000 poses, tiers (1,3,10), 3 LM steps, 1mm/0.01rad)")
        with open(os.path.join(BASE, "contract_tpu_r2.log"), "w") as f:
            f.write("PASS\n")

    # Order: the artifacts only this run can produce come first; the driver
    # re-runs bench.py itself at round end, so benches are last.
    stage("contract 1000 poses", contract)
    stage("bench xla", lambda: run_bench("xla", {"IKFLOW_TPU_BENCH_PALLAS": "0"}))
    stage("bench pallas", lambda: run_bench("pallas", {"IKFLOW_TPU_BENCH_PALLAS": "1"}))
    log("stage2 complete")


if __name__ == "__main__":
    main()
