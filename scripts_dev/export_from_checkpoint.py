"""Fallback deploy export: restore the latest orbax checkpoint and write the
.npz deploy artifact. Used by train_queue.sh when a watchdog kill landed
between the trainer's final checkpoint and its --export step (the export then
never ran, but the checkpoint is at most checkpoint_every steps old).

Runs on CPU — no TPU tunnel contention with whatever is training next.
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import argparse


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ikflow_tpu.flow import FlowHyperParams, build_flow
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training.checkpoints import export_deploy, restore_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--robot_name", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--nb_nodes", type=int, default=12)
    ap.add_argument("--dim_latent_space", type=int, required=True)
    ap.add_argument("--dtype", type=str, default=None,
                    help="storage dtype for the artifact (e.g. float16); native when omitted")
    ap.add_argument("--sigmoid_on_output", action="store_true")
    ap.add_argument("--disable_softflow", action="store_true",
                    help="must match the training run: softflow adds a conditioning "
                         "dim, so a mismatch fails the restore template shape check")
    ap.add_argument("--gate_mm", type=float, default=None,
                    help="refuse the export if the run's last val/l2_error_mm (read from "
                         "<ckpt_dir>/../metrics.jsonl) exceeds this — keeps the fallback "
                         "path from shipping weights the trainer's own gate refused")
    args = ap.parse_args()

    import json
    import math
    import os

    # Last recorded val quality: gates the export AND goes into the header so
    # the fallback artifact is as self-describing as a trainer export.
    metrics_path = os.path.join(os.path.dirname(os.path.abspath(args.ckpt_dir)),
                                "metrics.jsonl")
    last_val = None
    last_ang = None
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                try:
                    m = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "val/l2_error_mm" in m:
                    last_val = float(m["val/l2_error_mm"])
                    last_ang = float(m.get("val/angular_error_deg", float("nan")))

    if args.gate_mm is not None:
        if last_val is None or not math.isfinite(last_val) or last_val > args.gate_mm:
            print(f"EXPORT REFUSED (fallback gate): last val/l2_error_mm={last_val} "
                  f"vs gate {args.gate_mm} mm")
            return 1

    robot = get_robot(args.robot_name)
    hp = FlowHyperParams()
    hp.nb_nodes = args.nb_nodes
    hp.dim_latent_space = args.dim_latent_space
    hp.sigmoid_on_output = args.sigmoid_on_output
    hp.softflow_enabled = not args.disable_softflow
    flow = build_flow(hp, robot)
    # Orbax restores to the sharding recorded at save time (TPU); on this CPU
    # process we must hand it a CPU-resident template of the exact saved tree
    # shape — {params, opt_state} as written by save_checkpoint.
    from ikflow_tpu.training.optimizers import make_optimizer

    template = flow.init(jax.random.PRNGKey(0))
    opt_template = make_optimizer().init(template)
    try:
        restored, step = restore_checkpoint(
            args.ckpt_dir, template={"params": template, "opt_state": opt_template}
        )
    except ValueError:
        restored, step = restore_checkpoint(args.ckpt_dir, template={"params": template})
    quality = None
    if last_val is not None:
        quality = {"val_l2_error_mm": last_val, "val_angular_error_deg": last_ang}
    path = export_deploy(args.out, restored["params"], hp, robot.name, global_step=step,
                         dtype=args.dtype, quality=quality,
                         max_val_l2_mm=args.gate_mm)
    print(f"exported {path} from checkpoint step {step}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
