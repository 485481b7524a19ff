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
                    help="explicit quality-gate override (mm). Default: resolved from "
                         "the central per-model policy + incumbent rule "
                         "(training/checkpoints.py::resolve_export_gate), exactly like "
                         "the trainer's --export path")
    args = ap.parse_args()

    import json
    import math
    import os

    from ikflow_tpu.training.checkpoints import resolve_export_gate

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

    # Val quality MATCHED TO THE RESTORED STEP (checkpoint_every and
    # eval_every need not coincide, so "the last val record" can describe
    # weights newer than the checkpoint actually restored): take the latest
    # val record with step <= restored step, and refuse if none exists — a
    # gate passed on someone else's number is no gate at all.
    metrics_path = os.path.join(os.path.dirname(os.path.abspath(args.ckpt_dir)),
                                "metrics.jsonl")
    last_val = last_ang = None
    val_step = None
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                try:
                    m = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "val/l2_error_mm" in m and float(m.get("step", math.inf)) <= step:
                    last_val = float(m["val/l2_error_mm"])
                    last_ang = float(m.get("val/angular_error_deg", float("nan")))
                    val_step = m.get("step")
    if last_val is None:
        print(f"EXPORT REFUSED: no val record at step <= {step} in {metrics_path} — "
              f"cannot grade the restored weights")
        return 1

    gate_mm, gate_source = resolve_export_gate(args.out, args.gate_mm)
    print(f"deploy gate: {gate_mm} mm ({gate_source}); "
          f"val {last_val:.2f} mm at step {val_step} (restored step {step})")
    quality = {"val_l2_error_mm": last_val, "val_angular_error_deg": last_ang,
               "quality_source": f"metrics.jsonl step {val_step} (checkpoint step {step})"}
    path = export_deploy(args.out, restored["params"], hp, robot.name, global_step=step,
                         dtype=args.dtype, quality=quality,
                         max_val_l2_mm=gate_mm)
    print(f"exported {path} from checkpoint step {step}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
