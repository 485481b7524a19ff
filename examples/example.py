"""Canonical API usage, mirroring ``/root/reference/examples/example.py``:
single-pose sampling with details, batched poses, and exact solutions.

Quaternion convention is w, x, y, z (reference ``examples/example.py:42``).

Run:  python examples/example.py [--model_name panda__full__lp191_5.25m]
(uses random weights via --uninitialized when no trained artifact exists).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="panda__full__lp191_5.25m")
    parser.add_argument("--uninitialized", action="store_true")
    args = parser.parse_args()

    from ikflow_tpu.registry import get_ik_solver

    try:
        ik_solver, hyper_parameters = get_ik_solver(args.model_name)
        uninit = False
    except FileNotFoundError:
        print("(no trained weights found — running with random weights)")
        ik_solver, hyper_parameters = get_ik_solver(args.model_name, allow_uninitialized=True)
        uninit = True

    robot = ik_solver.robot
    key = jax.random.PRNGKey(0)

    # -----------------------------------------------------------------
    # Single target pose, n solutions, with error details
    # (reference example.py:40-61).
    target_pose = jnp.array([0.5, 0.5, 0.5, 1.0, 0.0, 0.0, 0.0])
    n = 5
    solutions, pos_errors, rot_errors, jlim_exceeded, self_colliding = (
        ik_solver.generate_ik_solutions(
            target_pose, n=n, return_detailed=True, key=key, allow_uninitialized=uninit
        )
    )
    print(f"\n{n} solutions for a single pose (robot: {robot.name}):")
    for i in range(n):
        print(
            f"  q={np.asarray(solutions[i]).round(3)}  pos_err={1000 * float(pos_errors[i]):.2f} mm"
            f"  rot_err={float(jnp.rad2deg(rot_errors[i])):.2f} deg"
        )

    # -----------------------------------------------------------------
    # Batched target poses (reference example.py:67-80).
    target_poses = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.PRNGKey(1), 8, joint_limit_eps=0.05)
    )
    solutions = ik_solver.generate_ik_solutions(target_poses, key=key, allow_uninitialized=uninit)
    print(f"\nbatched: {solutions.shape[0]} solutions for {target_poses.shape[0]} poses")

    # -----------------------------------------------------------------
    # Exact solutions with LM refinement (reference example.py:82-94).
    solutions, valids = ik_solver.generate_exact_ik_solutions(
        target_poses, key=jax.random.PRNGKey(2), allow_uninitialized=uninit,
        n_opt_steps_max=3 if not uninit else 40,
    )
    print(f"exact IK: {int(np.asarray(valids).sum())}/{valids.shape[0]} poses converged to 1 mm")

    # -----------------------------------------------------------------
    # Diversity-maximizing sampling (first-party, no reference counterpart):
    # farthest-point subset of an oversampled candidate draw.
    from ikflow_tpu.evaluation import solution_diversity

    diverse = ik_solver.generate_diverse_ik_solutions(
        target_pose, n=n, oversample=8, key=jax.random.PRNGKey(3),
        allow_uninitialized=uninit,
    )
    plain = ik_solver.generate_ik_solutions(
        target_pose, n=n, key=jax.random.PRNGKey(3), allow_uninitialized=uninit
    )
    raw_spread = float(solution_diversity(plain, 1, n)[0])
    div_spread = float(solution_diversity(diverse, 1, n)[0])
    print(f"diverse sampling: mean pairwise spread {div_spread:.3f} rad "
          f"(plain draw of the same size: {raw_spread:.3f})")


if __name__ == "__main__":
    main()
