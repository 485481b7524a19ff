"""Re-stamp deploy artifacts that shipped without a quality header.

The round-4 fallback exporter (pre-fix) wrote artifacts with no ``quality``
field, regressing the r3 invariant that every shipped .npz is
self-describing. This re-measures val quality for the named artifacts with
the trainer's export-time *procedure* — ``Trainer.validate`` on a seed-0
``build_dataset`` test split, key = PRNGKey(seed+7) — and rewrites the .npz
header in place (params untouched).

Caveat (recorded in the stamped ``quality_source``): runs trained with
``--on_device_data`` drew their test split from ``build_dataset_resident``
(redraw-compaction ``lax.scan``), which is a different RNG draw than the
rejection-sampled ``build_dataset`` split used here. The stamped number is a
same-distribution val measurement at the default 128-pose size, not a replay
of the training run's own split.
"""

from __future__ import annotations
import _pathfix  # noqa: F401

import argparse
import json


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ikflow_tpu.registry import get_ik_solver
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training import TrainConfig, Trainer
    from ikflow_tpu.training.dataset import build_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", required=True)
    ap.add_argument("--npz", required=True)
    ap.add_argument("--gate_mm", type=float, required=True,
                    help="recorded as quality_gate_mm; the stamp REFUSES if the "
                         "measured val exceeds it (same contract as export_deploy)")
    ap.add_argument("--val_set_size", type=int, default=128)
    args = ap.parse_args()

    solver, hp = get_ik_solver(args.model_name)
    robot = solver.robot
    # Tiny train split (unused by validate); the test split is the same
    # deterministic seed-0 draw every training run used.
    dataset = build_dataset(robot, training_set_size=256)
    cfg = TrainConfig(val_set_size=args.val_set_size)
    trainer = Trainer(solver.flow, robot, cfg, log_dir=None)
    val = trainer.validate(solver.params, dataset, jax.random.PRNGKey(cfg.seed + 7), step=0)
    l2 = val["val/l2_error_mm"]
    ang = val["val/angular_error_deg"]
    print(f"{args.model_name}: measured val l2 {l2:.2f} mm / ang {ang:.2f} deg")
    assert np.isfinite(l2) and l2 <= args.gate_mm, (
        f"measured val {l2:.2f} mm exceeds gate {args.gate_mm} — refusing to stamp"
    )

    z = np.load(args.npz)
    header = json.loads(bytes(z["__header__"]).decode())
    arrays = {k: z[k] for k in z.files if k != "__header__"}
    header["quality"] = {"val_l2_error_mm": float(l2), "val_angular_error_deg": float(ang)}
    header["quality_gate_mm"] = args.gate_mm
    header["quality_source"] = (
        f"re-measured post-hoc (scripts_dev/stamp_quality_headers.py): "
        f"build_dataset seed-0 split, n={args.val_set_size} — NOT the "
        f"training run's own split if it used --on_device_data"
    )
    np.savez_compressed(
        args.npz, __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        **arrays,
    )
    print(f"stamped {args.npz}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
