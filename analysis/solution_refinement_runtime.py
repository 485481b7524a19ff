"""Solution-refinement runtime comparison across solvers and batch sizes.

Parity with the reference's ``notebooks/solution_refinement_runtime_plotting.ipynb``,
which times IKFlow-seeded refinement by TRAC-IK and Klampt (C++ host solvers)
across batch sizes and pickles the results. The refinement roles here:

- ``approx``   — flow inverse only, no refinement (the floor);
- ``tpu_lm``   — our batched on-device LM (``generate_exact_ik_solutions``),
  the production path;
- ``native_lm`` — the first-party C++ float64 LM oracle
  (``native/fk_oracle.cpp``), seeded by the flow, playing the classical
  host-solver role that TRAC-IK/Klampt play in the notebook.

Outputs a markdown table and (optionally) a pickle with the same shape of
per-solver runtime/std/pct-success arrays the notebook saves.

Run: python analysis/solution_refinement_runtime.py [--model_name ...]
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import argparse
import pickle
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default=None)
    parser.add_argument("--robot_name", type=str, default="panda")
    parser.add_argument("--batch_sizes", type=int, nargs="*",
                        default=[100, 200, 300, 400, 500, 600, 700, 800, 900, 1000])
    parser.add_argument("--pos_tol", type=float, default=1e-3)
    parser.add_argument("--rot_tol", type=float, default=0.01)
    parser.add_argument("--k", type=int, default=3, help="timing repeats per cell")
    parser.add_argument("--uninitialized", action="store_true")
    parser.add_argument("--out_pickle", type=str, default=None)
    args = parser.parse_args()

    import jax
    import numpy as np

    from ikflow_tpu.robots.native_oracle import NativeFkOracle, native_available

    if args.model_name is not None:
        from ikflow_tpu.registry import get_ik_solver

        solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
    else:
        from ikflow_tpu.flow import FlowHyperParams
        from ikflow_tpu.robots import get_robot
        from ikflow_tpu.solver import IKFlowSolver

        robot = get_robot(args.robot_name)
        hp = FlowHyperParams()
        hp.dim_latent_space = max(robot.ndof, 7)
        solver = IKFlowSolver(hp, robot, seed=0)

    robot = solver.robot
    oracle = NativeFkOracle(robot) if native_available() else None
    kq = jax.random.PRNGKey(7)
    max_n = max(args.batch_sizes)
    all_targets = robot.forward_kinematics(
        robot.sample_joint_angles(kq, max_n, joint_limit_eps=0.02)
    )

    solver_names = ["approx", "tpu_lm"] + (["native_lm"] if oracle else [])
    data = {
        "model_name": args.model_name or f"untrained:{robot.name}",
        "batch_sizes": list(args.batch_sizes),
        "pos_tol": args.pos_tol,
        "rot_tol": args.rot_tol,
    }
    for s in solver_names:
        data[s] = {
            "runtimes": np.zeros(len(args.batch_sizes)),
            "stds": np.zeros(len(args.batch_sizes)),
            "pct_success": np.zeros(len(args.batch_sizes)),
        }

    def timed(solve_fn, grade_fn, k):
        """Time ONLY the solve (every method pays just its own blocking solve
        inside the window); success grading runs after the clock stops.
        One untimed call first (jit compile / library warmup)."""
        grade_fn(solve_fn(0))
        ts, success = [], 0.0
        for i in range(k):
            t0 = time.time()
            out = solve_fn(i + 1)
            ts.append(time.time() - t0)
            success = grade_fn(out)
        return float(np.mean(ts)), float(np.std(ts)), success

    from ikflow_tpu.lm import config_pose_errors as pose_errors

    for bi, n in enumerate(args.batch_sizes):
        targets = all_targets[:n]

        def solve_approx(i):
            sols = solver.generate_ik_solutions(
                targets, key=jax.random.PRNGKey(100 + i), allow_uninitialized=True
            )
            sols.block_until_ready()
            return sols

        def grade_approx(sols):
            pos_err, rot_err = pose_errors(robot, sols, targets)
            ok = (np.asarray(pos_err) < args.pos_tol) & (np.asarray(rot_err) < args.rot_tol)
            return float(ok.mean())

        def solve_tpu_lm(i):
            sols, valids = solver.generate_exact_ik_solutions(
                targets,
                pos_error_threshold=args.pos_tol,
                rot_error_threshold=args.rot_tol,
                key=jax.random.PRNGKey(200 + i),
                allow_uninitialized=True,
            )
            sols.block_until_ready()
            return valids

        def solve_native_lm(i):
            # Seed generation is part of this method's cost (the notebook's
            # klampt/TRAC-IK runs are IKFlow-seeded too).
            seeds = solver.generate_ik_solutions(
                targets, key=jax.random.PRNGKey(300 + i), allow_uninitialized=True
            )
            _, valid = oracle.ik_lm(
                np.asarray(targets, np.float64), np.asarray(seeds, np.float64),
                max_iters=10, pos_tol=args.pos_tol, rot_tol=args.rot_tol,
            )
            return valid

        runners = {
            "approx": (solve_approx, grade_approx),
            "tpu_lm": (solve_tpu_lm, lambda v: float(np.asarray(v).mean())),
        }
        if oracle:
            runners["native_lm"] = (solve_native_lm, lambda v: float(v.mean()))
        for s, (solve_fn, grade_fn) in runners.items():
            mean, std, pct = timed(solve_fn, grade_fn, args.k)
            data[s]["runtimes"][bi] = mean
            data[s]["stds"][bi] = std
            data[s]["pct_success"][bi] = pct

    print(f"\n### Refinement runtime vs batch size ({data['model_name']}, "
          f"{args.pos_tol * 1000:.1f} mm / {np.degrees(args.rot_tol):.3f} deg)\n")
    header = "| n | " + " | ".join(f"{s} ms (success %)" for s in solver_names) + " |"
    print(header)
    print("|---" * (len(solver_names) + 1) + "|")
    for bi, n in enumerate(args.batch_sizes):
        cells = [
            f"{1000 * data[s]['runtimes'][bi]:.1f} ± {1000 * data[s]['stds'][bi]:.1f} "
            f"({100 * data[s]['pct_success'][bi]:.0f}%)"
            for s in solver_names
        ]
        print(f"| {n} | " + " | ".join(cells) + " |")

    if args.out_pickle:
        with open(args.out_pickle, "wb") as f:
            pickle.dump(data, f)
        print(f"\nsaved {args.out_pickle}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
