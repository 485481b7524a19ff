"""``ikflow-tpu evaluate`` — accuracy + runtime evaluation of a model.

Parity: ``/root/reference/scripts/evaluate.py`` — 500-pose testset x
``--n_samples_for_errors`` solutions/pose, gaussian latent scale 0.75
(``evaluate.py:34-35``), reporting mean pos err (mm) / rot err (deg) /
% joint-limits-exceeded / % self-colliding plus runtime for 100-solution
batches; ``--do_refinement`` switches to the exact-IK path.
"""

from __future__ import annotations

import argparse
import time

DEFAULT_LATENT_SCALE = 0.75  # evaluate.py:34-35
DEFAULT_LATENT_DISTRIBUTION = "gaussian"


def _runtime_ms(solver, target, n_samples: int, key, allow_uninitialized: bool,
                runtime_k: int):
    """Mean time (ms) to produce ``n_samples`` solutions of one pose.

    Primary methodology: RTT-cancelling chained-scan differencing (same as
    ``bench.py``) so the column measures the chip, not the tunnel — the r2
    table reported ~26-34 ms for an operation the bench measures at ~0.06 ms
    because a per-call ``time.time()`` loop times dispatch RTT. Falls back to
    the RTT-inclusive loop (labeled as such) if the delta is noise-dominated.

    Returns ``(ms, methodology)`` where methodology is "device" or
    "rtt-inclusive".
    """
    import jax
    import jax.numpy as jnp

    from ikflow_tpu.utils.benchtools import chained_approx_build
    from ikflow_tpu.utils.profiling import DegenerateTimingError, measure_per_iter_s

    poses = jnp.tile(jnp.atleast_2d(target)[:1], (n_samples, 1))
    # Escalating chain lengths: a 100-solution approx solve is ~0.06-0.14 ms
    # of device time, so at scale_iters=1 the differenced delta (~10 ms) can
    # drown in tunnel-RTT variance. Multiplying the scan length grows the
    # delta linearly while dispatch/RTT still cancel — the same escalation the
    # bench's single-pose leg uses — so the fallback to RTT-inclusive wall
    # clock (which measures the tunnel, not the chip) becomes a last resort.
    for scale_iters in (8, 64, 256):
        build = chained_approx_build(
            solver, poses, key, latent_scale=DEFAULT_LATENT_SCALE,
            scale_iters=scale_iters,
        )
        try:
            per_iter = measure_per_iter_s(
                build, f"runtime column (x{scale_iters})", k_deltas=(8, 64)
            ) / scale_iters
            return 1000.0 * per_iter, "device"
        except DegenerateTimingError:
            continue
    times = []
    for i in range(max(runtime_k, 1) + 1):  # first call compiles
        t0 = time.time()
        out = solver.generate_ik_solutions(
            target, n=n_samples, key=jax.random.fold_in(key, i),
            allow_uninitialized=allow_uninitialized,
        )
        out.block_until_ready()
        times.append(time.time() - t0)
    times = times[1:]
    return 1000.0 * sum(times) / len(times), "rtt-inclusive"


def add_parser(sub):
    p = sub.add_parser("evaluate", help="evaluate a trained model")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--robot_name", type=str, default=None, help="with --uninitialized: evaluate random weights")
    p.add_argument("--testset_size", type=int, default=500)
    p.add_argument("--n_samples_for_errors", type=int, default=50)
    p.add_argument("--n_runtime_samples", type=int, default=100)
    def _positive_int(v):
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError("--runtime_k must be >= 1")
        return iv

    p.add_argument("--runtime_k", type=_positive_int, default=5)
    p.add_argument("--do_refinement", action="store_true")
    p.add_argument("--self_colliding_dataset", action="store_true",
                   help="evaluate on an UNfiltered testset (the reference defaults to a "
                        "non-self-colliding testset, evaluate.py:195)")
    p.add_argument("--uninitialized", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--all", dest="eval_all", action="store_true",
                   help="evaluate every registered model and append a markdown table "
                        "to model_performances.md (parity: evaluate.py --all; unlike the "
                        "reference the file is created if missing)")
    p.add_argument("--performances_file", type=str, default="model_performances.md")
    p.set_defaults(func=run)
    return p


def _run_all(args: argparse.Namespace) -> int:
    """Evaluate every registered model that has weights on disk (or all, with
    --uninitialized) and regenerate the performances markdown table
    (parity: evaluate.py:227-236, but truncate-and-rewrite, not append)."""
    import datetime

    import jax
    import jax.numpy as jnp

    from ikflow_tpu.registry import get_all_model_names, get_ik_solver

    rows = []
    for name in get_all_model_names():
        try:
            solver, hp = get_ik_solver(name, allow_uninitialized=args.uninitialized)
        except FileNotFoundError:
            print(f"skipping {name} (no weights; pass --uninitialized to include)")
            continue
        robot = solver.robot
        key = jax.random.PRNGKey(args.seed)
        k1, k2 = jax.random.split(key)
        # Non-self-colliding testset by default (parity: evaluate.py:137-138,
        # :195 — the reference evaluates on nsc poses unless told otherwise).
        if args.self_colliding_dataset:
            testset = robot.forward_kinematics(
                robot.sample_joint_angles(k1, args.testset_size, joint_limit_eps=0.02)
            )
        else:
            _, testset = robot.sample_joint_angles_and_poses(
                k1, args.testset_size, joint_limit_eps=0.02,
                only_non_self_colliding=True, oversample_factor=4,
            )
        poses_t = jnp.repeat(testset, args.n_samples_for_errors, axis=0)
        sols = solver.generate_ik_solutions(
            poses_t, latent_distribution=DEFAULT_LATENT_DISTRIBUTION,
            latent_scale=DEFAULT_LATENT_SCALE, key=k2, allow_uninitialized=args.uninitialized,
        )
        ev = solver.evaluate(poses_t, sols)
        from ikflow_tpu.evaluation import solution_diversity

        diversity = float(jnp.mean(solution_diversity(
            sols, args.testset_size, args.n_samples_for_errors
        )))
        # Runtime for n_runtime_samples solutions of one pose (parity:
        # evaluate.py:93-108), measured with the bench's chained differencing
        # so the column reflects device time, not tunnel RTT.
        runtime_ms, runtime_how = _runtime_ms(
            solver, testset[0], args.n_runtime_samples, k2,
            args.uninitialized, args.runtime_k,
        )
        rows.append((
            name, robot.name,
            1000 * float(jnp.mean(ev.pos_errors)),
            float(jnp.rad2deg(jnp.mean(ev.rot_errors))),
            100 * float(jnp.mean(ev.joint_limits_exceeded.astype(jnp.float32))),
            100 * float(jnp.mean(ev.self_colliding.astype(jnp.float32))),
            runtime_ms,
            hp.nb_nodes,
            runtime_how,
            diversity,
        ))
        print(f"evaluated {name}")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    # Truncate-and-regenerate: the table IS the current state of the registry,
    # not a log (the reference appends, which required a manual .prev sidecar
    # workaround in r2; advisor item).
    with open(args.performances_file, "w") as f:
        f.write("# Model performances\n")
        f.write(f"\n## {stamp} ({args.testset_size} poses x {args.n_samples_for_errors} sols, "
                f"latent scale {DEFAULT_LATENT_SCALE})\n\n")
        f.write(f"| model | robot | mean l2 (mm) | mean ang (deg) | % jlim exceeded | "
                f"% self-colliding | diversity (rad)† | mean runtime for {args.n_runtime_samples} sols (ms)* | coupling layers |\n")
        f.write("|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            rt = f"{r[6]:.3f}" + (" (rtt)" if r[8] == "rtt-inclusive" else "")
            f.write(f"| {r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.2f} | {r[4]:.2f} | {r[5]:.2f} "
                    f"| {r[9]:.3f} | {rt} | {r[7]} |\n")
        f.write(
            "\n† solution diversity: mean pairwise joint-space L2 distance "
            "(rad) across the per-pose sample draw — a first-party metric the "
            "reference lacks (the IKFlow paper's diversity claim, graded); "
            "~0 would indicate mode collapse.\n\n"
            "\\* device time via RTT-cancelling chained-scan differencing "
            "(same methodology as bench.py); rows marked \"(rtt)\" fell back "
            "to per-call wall clock and include host-device tunnel round-trip "
            "time.\n\n"
            "Self-collision grading uses the measured MuJoCo-validated capsule "
            "set (round 3) — substantially stricter than the r2 skeleton "
            "capsules and than jrl's checker, so %-self-colliding is not "
            "comparable across rounds or with the reference's 3-6% "
            "expectation (see docs/DESIGN.md, robots section).\n"
        )
    print(f"wrote {len(rows)} rows to {args.performances_file}")
    return 0


def run(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver

    if args.eval_all:
        return _run_all(args)

    if args.model_name:
        from ikflow_tpu.registry import get_ik_solver

        solver, hp = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
    else:
        assert args.robot_name, "need --model_name or --robot_name"
        solver = IKFlowSolver(FlowHyperParams(), get_robot(args.robot_name))
        args.uninitialized = True

    robot = solver.robot
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    # Non-self-colliding testset by default (parity: evaluate.py:137-138,:195).
    if args.self_colliding_dataset:
        testset = robot.forward_kinematics(
            robot.sample_joint_angles(k1, args.testset_size, joint_limit_eps=0.02)
        )
    else:
        _, testset = robot.sample_joint_angles_and_poses(
            k1, args.testset_size, joint_limit_eps=0.02,
            only_non_self_colliding=True, oversample_factor=4,
        )

    # Accuracy: n_samples_for_errors solutions per pose, graded in one program.
    m = args.n_samples_for_errors
    poses_t = jnp.repeat(testset, m, axis=0)
    if args.do_refinement:
        sols, valids = solver.generate_exact_ik_solutions(
            poses_t, key=k2, allow_uninitialized=args.uninitialized
        )
        print(f"exact-IK valid fraction: {float(np.asarray(valids).mean()):.3f}")
    else:
        sols = solver.generate_ik_solutions(
            poses_t,
            latent_distribution=DEFAULT_LATENT_DISTRIBUTION,
            latent_scale=DEFAULT_LATENT_SCALE,
            key=k2,
            allow_uninitialized=args.uninitialized,
        )
    ev = solver.evaluate(poses_t, sols)
    print("--- Accuracy (ErrorStats parity: evaluate.py:42-90) ---")
    print(f"mean_l2_error_mm:         {1000 * float(jnp.mean(ev.pos_errors)):8.3f}")
    print(f"mean_angular_error_deg:   {float(jnp.rad2deg(jnp.mean(ev.rot_errors))):8.3f}")
    print(f"pct_joint_limits_exceeded:{100 * float(jnp.mean(ev.joint_limits_exceeded.astype(jnp.float32))):8.2f}")
    print(f"pct_self_colliding:       {100 * float(jnp.mean(ev.self_colliding.astype(jnp.float32))):8.2f}")
    if m >= 2:
        from ikflow_tpu.evaluation import solution_diversity

        div = float(jnp.mean(solution_diversity(sols, args.testset_size, m)))
        print(f"mean_pairwise_dq_rad:     {div:8.3f}  (solution diversity; first-party metric)")

    # Runtime: 100-solution single-pose batches (evaluate.py:93-108), device
    # time via chained differencing (falls back to RTT-inclusive, labeled).
    runtime_ms, runtime_how = _runtime_ms(
        solver, testset[0], args.n_runtime_samples, k3,
        args.uninitialized, args.runtime_k,
    )
    print("--- Runtime ---")
    print(f"mean_runtime_ms_for_{args.n_runtime_samples}_sols: {runtime_ms:.3f} ({runtime_how})")
    return 0
