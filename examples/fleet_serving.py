"""Serving-scale exact IK on a TPU mesh — the workflow the reference can't do.

The reference solves exact IK on one GPU with dynamic batch shrinking and
CPU hops (``/root/reference/ikflow/ikflow_solver.py:191-233``). Here the same
contract (1 mm / 0.572 deg) runs as fixed-shape XLA programs sharded over
every chip in the mesh, and arbitrarily large pose sets stream through one
compiled chunk program with bounded device memory:

1. ``solve_exact_sharded`` — one batch, poses sharded over ``("data",)``.
2. ``solve_exact_megabatch`` — 50k+ poses streamed in fixed-shape chunks;
   its default "probe" policy measures per-tier miss rates on the first chunk
   and capacity-caps the retry tiers of every later chunk (~7x less retry
   work with trained weights, validity-monitored).
3. ``scaling_efficiency`` — throughput at 1 device vs the full mesh.

Run (any backend; on a dev box force a virtual mesh first):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python examples/fleet_serving.py --uninitialized --n 2048
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="panda__full__lp191_5.25m")
    parser.add_argument("--n", type=int, default=2048, help="poses for the sharded solve")
    parser.add_argument("--mega_n", type=int, default=0,
                        help="poses for the streaming megabatch demo (0 = 4 chunks)")
    parser.add_argument("--chunk_size", type=int, default=1024)
    parser.add_argument("--uninitialized", action="store_true",
                        help="random weights (demo mechanics without a trained model)")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from ikflow_tpu.parallel import make_mesh
    from ikflow_tpu.parallel.fleet import (
        scaling_efficiency,
        solve_exact_megabatch,
        solve_exact_sharded,
    )
    from ikflow_tpu.registry import get_ik_solver

    solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
    robot = solver.robot
    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} x {mesh.devices.flat[0].platform} over axis {mesh.axis_names}")

    key = jax.random.PRNGKey(0)
    solve_kwargs = dict(
        repeat_counts=(1, 3, 10), n_opt_steps_max=3,
        pos_error_threshold=1e-3, rot_error_threshold=0.01,
        allow_uninitialized=args.uninitialized,
    )

    # 1. One sharded batch across the whole mesh.
    poses = robot.forward_kinematics(
        robot.sample_joint_angles(key, args.n, joint_limit_eps=0.02)
    )
    sols, valids = solve_exact_sharded(solver, poses, mesh=mesh, key=key, **solve_kwargs)
    print(f"sharded solve: {args.n} poses -> {float(np.asarray(valids).mean()):.1%} valid")

    # 2. Streaming megabatch: memory bounded by one chunk, one compile total.
    mega_n = args.mega_n or 4 * args.chunk_size
    big = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.fold_in(key, 1), mega_n, joint_limit_eps=0.02)
    )
    sols, valids = solve_exact_megabatch(
        solver, big, chunk_size=args.chunk_size, mesh=mesh, progress=True, **solve_kwargs
    )
    print(f"megabatch: {mega_n} poses -> {valids.mean():.1%} valid")

    # 3. Scaling: throughput per device count.
    for row in scaling_efficiency(solver, n_poses=args.n, key=key, **solve_kwargs):
        print(f"  {row['devices']} device(s): {row['sols_per_s']:.0f} sols/s "
              f"(efficiency {row['efficiency']:.0%})")


if __name__ == "__main__":
    main()
