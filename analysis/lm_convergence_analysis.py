"""LM repeat-count / step-budget tuning analysis.

Parity with the reference's ``notebooks/ik_convergence_analysis.ipynb`` (which
tunes ``repeat_counts`` for ``generate_exact_ik_solutions``): sweeps
(repeat_count, n_opt_steps) and prints the valid fraction + runtime for each
cell, as a markdown table.

Run: python analysis/lm_convergence_analysis.py [--model_name ...] [--n 500]
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import argparse
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default=None)
    parser.add_argument("--robot_name", type=str, default="panda")
    parser.add_argument("--n", type=int, default=500)
    parser.add_argument("--repeat_counts", type=int, nargs="*", default=[1, 2, 4, 8])
    parser.add_argument("--step_budgets", type=int, nargs="*", default=[2, 3, 5, 10, 20])
    parser.add_argument("--uninitialized", action="store_true")
    args = parser.parse_args()

    import jax
    import numpy as np

    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver

    if args.model_name:
        from ikflow_tpu.registry import get_ik_solver

        solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
    else:
        solver = IKFlowSolver(FlowHyperParams(), get_robot(args.robot_name))
        args.uninitialized = True
    robot = solver.robot

    key = jax.random.PRNGKey(0)
    poses = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.fold_in(key, 1), args.n, joint_limit_eps=0.02)
    )

    print(f"| repeat | steps | valid % | seconds (n={args.n}) |")
    print("|---|---|---|---|")
    for r in args.repeat_counts:
        for steps in args.step_budgets:
            def go(k):
                sols, valids = solver.generate_exact_ik_solutions(
                    poses, repeat_counts=(r,), n_opt_steps_max=steps,
                    pos_error_threshold=1e-3, rot_error_threshold=0.01,
                    key=k, allow_uninitialized=args.uninitialized,
                )
                sols.block_until_ready()
                return valids

            valids = go(jax.random.fold_in(key, 2))  # compile
            t0 = time.time()
            valids = go(jax.random.fold_in(key, 3))
            dt = time.time() - t0
            print(f"| {r} | {steps} | {100 * float(np.asarray(valids).mean()):.1f} | {dt:.3f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
