"""``ikflow-tpu visualize`` — headless demo renders.

Parity: ``/root/reference/scripts/visualize.py`` (demo-name dispatch) +
``visualize_robot.py``, producing PNG/GIF artifacts instead of a Klampt window.
"""

from __future__ import annotations

import argparse

DEMOS = ("oscillate_latent", "oscillate_target", "visualize_fk", "oscillate_joints")


def add_parser(sub):
    p = sub.add_parser("visualize", help="render demo visualizations (PNG/GIF)")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--robot_name", type=str, default=None)
    p.add_argument("--demo_name", type=str, default="oscillate_latent", choices=DEMOS)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--n_frames", type=int, default=40)
    p.add_argument("--uninitialized", action="store_true")
    p.add_argument("--interactive", action="store_true",
                   help="write a self-contained interactive 3-D .html scene "
                        "(orbit/zoom/scrub, no dependencies) instead of PNG/GIF")
    p.set_defaults(func=run)
    return p


def run(args: argparse.Namespace) -> int:
    from ikflow_tpu import visualization as viz
    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver

    if args.model_name:
        from ikflow_tpu.registry import get_ik_solver

        solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
        robot = solver.robot
    else:
        assert args.robot_name, "need --model_name or --robot_name"
        robot = get_robot(args.robot_name)
        solver = IKFlowSolver(FlowHyperParams(), robot)

    if args.interactive:
        from ikflow_tpu import viz_interactive as ivz

        out = args.output or f"{robot.name}__{args.demo_name}.html"
        if args.demo_name == "visualize_fk":
            path = ivz.interactive_fk(robot, out_path=out)
        elif args.demo_name == "oscillate_target":
            path = ivz.interactive_oscillate_target(
                solver, n_frames=args.n_frames, out_path=out,
                allow_uninitialized=args.uninitialized,
            )
        elif args.demo_name == "oscillate_joints":
            path = ivz.interactive_oscillate_joints(
                robot, n_frames=args.n_frames, out_path=out
            )
        else:  # oscillate_latent
            path = ivz.interactive_oscillate_latent(
                solver, n_frames=args.n_frames, out_path=out,
                allow_uninitialized=args.uninitialized,
            )
        print(f"wrote {path}")
        return 0

    ext = "png" if args.demo_name == "visualize_fk" else "gif"
    out = args.output or f"{robot.name}__{args.demo_name}.{ext}"
    if args.demo_name == "visualize_fk":
        path = viz.visualize_fk(robot, out_path=out)
    elif args.demo_name == "oscillate_latent":
        path = viz.oscillate_latent(solver, n_frames=args.n_frames, out_path=out)
    elif args.demo_name == "oscillate_target":
        path = viz.oscillate_target(solver, n_frames=args.n_frames, out_path=out)
    else:
        path = viz.oscillate_joints(robot, n_frames=args.n_frames, out_path=out)
    print(f"wrote {path}")
    return 0
