"""``ikflow-tpu build-dataset`` — on-device dataset generation.

Parity: ``/root/reference/scripts/build_dataset.py`` (flags ``--robot_name``,
``--training_set_size``, ``--only_non_self_colliding``), with generation running
on the accelerator instead of the host.
"""

from __future__ import annotations

import argparse
import time


def add_parser(sub):
    p = sub.add_parser("build-dataset", help="generate an IK dataset on-device")
    p.add_argument("--robot_name", type=str, required=True)
    p.add_argument("--training_set_size", type=int, default=2_500_000)
    p.add_argument("--test_set_size", type=int, default=15_000)
    p.add_argument("--only_non_self_colliding", action="store_true", default=True)
    p.add_argument("--all_configs", dest="only_non_self_colliding", action="store_false",
                   help="keep self-colliding configs too")
    p.add_argument("--joint_limit_eps", type=float, default=0.004363)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", type=str, default=None)
    p.set_defaults(func=run)
    return p


def run(args: argparse.Namespace) -> int:
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training import build_dataset, save_dataset

    robot = get_robot(args.robot_name)
    t0 = time.time()
    ds = build_dataset(
        robot,
        training_set_size=args.training_set_size,
        test_set_size=args.test_set_size,
        only_non_self_colliding=args.only_non_self_colliding,
        joint_limit_eps=args.joint_limit_eps,
        seed=args.seed,
    )
    directory = save_dataset(ds, args.output_dir)
    dt = time.time() - t0
    print(f"built {ds.n_train} train / {ds.samples_te.shape[0]} test samples for "
          f"{args.robot_name} in {dt:.1f}s -> {directory}")
    return 0
