"""Robot solution-family renders + latent-distribution error statistics.

Parity with the reference's ``notebooks/robot_visualizations.ipynb``, which
(a) renders a robot with N IKFlow solutions overlaid at a target pose in a
Klampt OpenGL window, and (b) per its overview cell, "illustrates the impact
of the latent noise distribution on the resulting error statistics of
generated samples". This headless analog:

1. renders a static solution-family figure (N skeleton overlays at the demo
   target pose) per robot to PNG — no OpenGL/Qt needed;
2. prints a markdown table of pose-error statistics over a
   (distribution in {gaussian, uniform}) x (latent scale) sweep.

Run: python analysis/robot_visualizations.py [--model_name ...] [--robots ...]
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import argparse
import os


def render_solution_family(solver, n_solutions: int, out_path: str, seed: int = 0):
    """N solutions at the robot's demo target pose, overlaid as 3-D skeletons
    (the notebook's SOL_MODE="IKFLOW", N_SOLUTIONS=10 scene, headless)."""
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ikflow_tpu.visualization import _setup_ax, _skeleton_points, demo_target_pose

    robot = solver.robot
    target = demo_target_pose(robot.name)
    sols = np.asarray(
        solver.generate_ik_solutions(
            target, n=n_solutions, key=jax.random.PRNGKey(seed), allow_uninitialized=True
        )
    )
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    _setup_ax(ax, f"{robot.name} — {n_solutions} IK solutions")
    for i in range(n_solutions):
        pts = _skeleton_points(robot, sols[i])
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-o", markersize=3, alpha=0.6)
    ax.scatter(*target[:3], color="red", s=80, marker="*")
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def latent_distribution_stats(solver, n_poses: int, n_sols: int, seed: int = 0):
    """Error stats per (distribution, scale): the notebook's overview claim.

    Returns rows of (distribution, scale, mean mm, mean deg)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ikflow_tpu.lm import config_pose_errors as pose_errors

    robot = solver.robot
    kq, ks = jax.random.split(jax.random.PRNGKey(seed))
    targets = robot.forward_kinematics(
        robot.sample_joint_angles(kq, n_poses, joint_limit_eps=0.02)
    )
    tiled = jnp.repeat(targets, n_sols, axis=0)
    rows = []
    cells = [(d, s) for d in ("gaussian", "uniform") for s in (0.25, 0.5, 0.75, 1.0, 1.5)]
    for cell_idx, (dist, scale) in enumerate(cells):
        sols = solver.generate_ik_solutions(
            tiled,
            latent_distribution=dist,
            latent_scale=scale,
            key=jax.random.fold_in(ks, cell_idx),
            allow_uninitialized=True,
        )
        pos_err, rot_err = pose_errors(robot, sols, tiled)
        rows.append(
            (dist, scale,
             float(1000.0 * np.mean(np.asarray(pos_err))),
             float(np.degrees(np.mean(np.asarray(rot_err)))))
        )
    return rows


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default=None,
                        help="registry model (weights required unless --uninitialized)")
    parser.add_argument("--robots", type=str, nargs="*", default=["panda"],
                        help="robots to render when no --model_name is given")
    parser.add_argument("--n_solutions", type=int, default=10)
    parser.add_argument("--n_poses", type=int, default=100)
    parser.add_argument("--n_sols_per_pose", type=int, default=20)
    parser.add_argument("--out_dir", type=str, default="robot_visualizations")
    parser.add_argument("--uninitialized", action="store_true")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)

    solvers = []
    if args.model_name is not None:
        from ikflow_tpu.registry import get_ik_solver

        solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
        solvers.append(solver)
    else:
        from ikflow_tpu.flow import FlowHyperParams
        from ikflow_tpu.robots import get_robot
        from ikflow_tpu.solver import IKFlowSolver

        for name in args.robots:
            robot = get_robot(name)
            hp = FlowHyperParams()
            hp.dim_latent_space = max(robot.ndof, 7)
            solvers.append(IKFlowSolver(hp, robot, seed=0))

    for solver in solvers:
        out = os.path.join(args.out_dir, f"{solver.robot.name}_solutions.png")
        print(f"rendering {out} ...")
        render_solution_family(solver, args.n_solutions, out)

        print(f"\n### {solver.robot.name}: latent distribution vs error statistics "
              f"({args.n_poses} poses x {args.n_sols_per_pose} solutions)\n")
        print("| distribution | scale | mean pos err (mm) | mean rot err (deg) |")
        print("|---|---|---|---|")
        for dist, scale, mm, deg in latent_distribution_stats(
            solver, args.n_poses, args.n_sols_per_pose
        ):
            print(f"| {dist} | {scale} | {mm:.3f} | {deg:.3f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
