"""``ikflow-tpu solve`` — solve IK for a pose from the command line.

Covers the reference's ``examples/example.py`` usage patterns (single pose n
solutions with details; exact solutions) as a CLI.
"""

from __future__ import annotations

import argparse


def add_parser(sub):
    p = sub.add_parser("solve", help="sample IK solutions for a target pose")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--robot_name", type=str, default=None)
    p.add_argument("--pose", type=float, nargs=7, required=True,
                   metavar=("X", "Y", "Z", "QW", "QX", "QY", "QZ"))
    p.add_argument("-n", "--n_solutions", type=int, default=10)
    p.add_argument("--exact", action="store_true")
    p.add_argument("--diverse", action="store_true",
                   help="maximize joint-space spread: draw n x --oversample "
                        "candidates and keep the farthest-point subset "
                        "(solver.generate_diverse_ik_solutions; first-party "
                        "extension — plain sampling clusters at the density mode)")
    p.add_argument("--oversample", type=int, default=4,
                   help="candidate multiplier for --diverse")
    p.add_argument("--uninitialized", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(func=run)
    return p


def run(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver

    if args.model_name:
        from ikflow_tpu.registry import get_ik_solver

        solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
    else:
        assert args.robot_name, "need --model_name or --robot_name"
        solver = IKFlowSolver(FlowHyperParams(), get_robot(args.robot_name))
        args.uninitialized = True

    pose = jnp.asarray(args.pose)
    key = jax.random.PRNGKey(args.seed)
    if args.exact:
        poses = jnp.broadcast_to(pose, (args.n_solutions, 7))
        sols, valids = solver.generate_exact_ik_solutions(
            poses, key=key, allow_uninitialized=args.uninitialized
        )
        for i in range(args.n_solutions):
            print(f"[{'ok' if bool(valids[i]) else 'FAIL'}] {np.asarray(sols[i]).round(5)}")
    elif args.diverse:
        from ikflow_tpu.evaluation import solution_diversity, solution_pose_errors

        sols = solver.generate_diverse_ik_solutions(
            pose, n=args.n_solutions, oversample=args.oversample, key=key,
            allow_uninitialized=args.uninitialized,
        )
        pos_e, rot_e = solution_pose_errors(solver.robot, sols, pose)
        for i in range(args.n_solutions):
            print(f"q={np.asarray(sols[i]).round(5)}  pos_err={float(pos_e[i]) * 1000:.2f}mm "
                  f"rot_err={float(jnp.rad2deg(rot_e[i])):.2f}deg")
        div = float(solution_diversity(sols, 1, args.n_solutions)[0])
        print(f"mean pairwise spread: {div:.3f} rad over {args.n_solutions} solutions "
              f"(farthest-point subset of {args.n_solutions * args.oversample} candidates)")
    else:
        sols, pos_e, rot_e, jl, sc = solver.generate_ik_solutions(
            pose, n=args.n_solutions, key=key, return_detailed=True,
            allow_uninitialized=args.uninitialized,
        )
        for i in range(args.n_solutions):
            print(f"q={np.asarray(sols[i]).round(5)}  pos_err={float(pos_e[i]) * 1000:.2f}mm "
                  f"rot_err={float(jnp.rad2deg(rot_e[i])):.2f}deg "
                  f"jlim={bool(jl[i])} selfcol={bool(sc[i])}")
    return 0
