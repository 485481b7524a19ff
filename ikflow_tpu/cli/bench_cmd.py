"""``ikflow-tpu benchmark`` — runtime curves for approximate and exact IK.

Parity: ``/root/reference/scripts/benchmark_generate_exact_solutions.py``
(batch sizes 1..1000 x repeat-count tiers, 1 mm / 0.01 rad —
``benchmark_...py:18-19,145-151``) and ``benchmark_runtime.py`` (solve-method
comparison over batch sizes). Emits a JSON table on stdout.
"""

from __future__ import annotations

import argparse
import json
import time

EXACT_POS_TOL = 1e-3  # benchmark_generate_exact_solutions.py:18
EXACT_ROT_TOL = 0.01  # benchmark_generate_exact_solutions.py:19


def add_parser(sub):
    p = sub.add_parser("benchmark", help="runtime curves (approx + exact IK)")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--robot_name", type=str, default="panda")
    p.add_argument("--batch_sizes", type=int, nargs="*", default=[1, 10, 100, 500, 1000, 5000])
    p.add_argument("--mode", choices=["approx", "exact", "both"], default="both")
    p.add_argument("--k", type=int, default=5, help="timed repeats per size")
    p.add_argument("--n_opt_steps_max", type=int, default=3)
    p.add_argument("--repeat_counts", type=int, nargs="*", default=[1, 3, 10])
    p.add_argument("--uninitialized", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sweep_nb_nodes", type=int, nargs="*", default=None,
                   help="runtime-vs-depth sweep (parity: scripts/evaluate_inference_speed.py)")
    p.add_argument("--scaling", action="store_true",
                   help="1-device vs all-devices exact-IK scaling efficiency")
    p.add_argument("--megabatch", type=int, default=None,
                   help="streaming exact-IK over N poses in fixed-shape chunks (serving scale)")
    p.add_argument("--chunk_size", type=int, default=2048,
                   help="probe/tail chunk size for --megabatch (the uncapped probe "
                        "pays ~14x per-pose work, so this stays small; the default "
                        "matches the committed MEGABATCH artifact)")
    p.add_argument("--steady_chunk", type=int, default=32768,
                   help="steady-state chunk size for --megabatch (several "
                        "mid-size chunks overlap device->host collection with "
                        "compute; the default matches the committed MEGABATCH "
                        "artifact and fleet.solve_exact_megabatch's default)")
    p.add_argument("--compare", action="store_true",
                   help="4-method comparison: flow-approx / native-LM / flow+LM exact / "
                        "native-LM seeded by flow (parity: scripts/benchmark_runtime.py)")
    p.add_argument("--differencing", action="store_true",
                   help="measure with RTT-cancelling chained-scan differencing (device "
                        "time; refuses noise-dominated measurements) instead of per-call "
                        "wall clock. Applies to --mode approx/exact/both.")
    p.add_argument("--capacity", choices=["probe", "full", "compact"], default="probe",
                   help="retry-tier capacity policy for exact IK: 'probe' derives "
                        "per-tier capacities from a measured uncapped probe at each "
                        "batch size (2x headroom over observed miss rates; falls back "
                        "to full width when tier-1 misses >40%%, e.g. untrained "
                        "weights); 'full' re-solves every pose in every tier "
                        "(reference-shaped, ikflow_solver.py:389 without the shrink); "
                        "'compact' (--megabatch only, its default) retries only the "
                        "measured misses via host-side cross-chunk compaction")
    p.set_defaults(func=run)
    return p


def _run_compare(args, solver) -> int:
    """4 solve methods over batch sizes (parity: benchmark_runtime.py:76-93):
    flow-approx (device), native LM from random seeds (host C++, the
    klampt-IK role), flow+LM exact (device), native LM seeded by the flow."""
    import jax
    import numpy as np

    from ikflow_tpu.robots.native_oracle import NativeFkOracle, native_available

    robot = solver.robot
    oracle = NativeFkOracle(robot) if native_available() else None
    key = jax.random.PRNGKey(args.seed)
    for n in args.batch_sizes:
        kp, ks = jax.random.split(jax.random.fold_in(key, n))
        poses = robot.forward_kinematics(robot.sample_joint_angles(kp, n, joint_limit_eps=0.02))
        poses_np = np.asarray(poses, dtype=np.float64)

        def m_approx():
            out = solver.generate_ik_solutions(poses, key=ks, allow_uninitialized=args.uninitialized)
            out.block_until_ready()
            return out

        t = _timed(m_approx, args.k)
        print(json.dumps({"mode": "flow_approx", "batch": n, "seconds": t, "sols_per_s": n / t}))

        def m_exact():
            sols, valids = solver.generate_exact_ik_solutions(
                poses, repeat_counts=tuple(args.repeat_counts), n_opt_steps_max=args.n_opt_steps_max,
                pos_error_threshold=EXACT_POS_TOL, rot_error_threshold=EXACT_ROT_TOL,
                key=ks, allow_uninitialized=args.uninitialized,
            )
            sols.block_until_ready()
            return valids

        valids = m_exact()
        t = _timed(m_exact, args.k)
        print(json.dumps({"mode": "flow_plus_lm_exact", "batch": n, "seconds": t,
                          "sols_per_s": n / t, "valid_fraction": float(np.asarray(valids).mean())}))

        if oracle is not None:
            q_rand = np.asarray(robot.sample_joint_angles(ks, n), dtype=np.float64)

            def m_native():
                return oracle.ik_lm(poses_np, q_rand.copy(), max_iters=60,
                                    pos_tol=EXACT_POS_TOL, rot_tol=EXACT_ROT_TOL)

            _, valid = m_native()
            t = _timed(lambda: m_native()[0], args.k)
            print(json.dumps({"mode": "native_lm_random_seed", "batch": n, "seconds": t,
                              "sols_per_s": n / t, "valid_fraction": float(valid.mean())}))

            seeds = np.asarray(
                solver.generate_ik_solutions(poses, key=ks, allow_uninitialized=args.uninitialized),
                dtype=np.float64,
            )

            def m_native_seeded():
                return oracle.ik_lm(poses_np, seeds.copy(), max_iters=20,
                                    pos_tol=EXACT_POS_TOL, rot_tol=EXACT_ROT_TOL)

            _, valid = m_native_seeded()
            t = _timed(lambda: m_native_seeded()[0], args.k)
            print(json.dumps({"mode": "native_lm_flow_seeded", "batch": n, "seconds": t,
                              "sols_per_s": n / t, "valid_fraction": float(valid.mean())}))
    return 0


def _timed(fn, k):
    fn()  # compile
    ts = []
    for _ in range(k):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]  # median


def run(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver

    if args.sweep_nb_nodes is not None:
        # Runtime vs coupling-stack depth, 30 reps x 100 sols
        # (parity: evaluate_inference_speed.py:23-33,76-84).
        robot = get_robot(args.robot_name)
        for nb in args.sweep_nb_nodes or [4, 6, 8, 10, 12, 16]:
            hp = FlowHyperParams()
            hp.nb_nodes = nb
            hp.dim_latent_space = max(robot.ndof, 8)
            s = IKFlowSolver(hp, robot)
            pose = robot.forward_kinematics(robot.sample_joint_angles(
                jax.random.PRNGKey(0), 1))[0]

            def go():
                out = s.generate_ik_solutions(pose, n=100, key=jax.random.PRNGKey(1),
                                              allow_uninitialized=True)
                out.block_until_ready()

            t = _timed(go, 30)
            print(json.dumps({"mode": "nb_nodes_sweep", "nb_nodes": nb, "ms_per_100_sols": 1000 * t}))
        return 0

    if args.model_name:
        from ikflow_tpu.registry import get_ik_solver

        solver, _ = get_ik_solver(args.model_name, allow_uninitialized=args.uninitialized)
    else:
        solver = IKFlowSolver(FlowHyperParams(), get_robot(args.robot_name))
        args.uninitialized = True
    robot = solver.robot

    if args.scaling:
        from ikflow_tpu.parallel.fleet import scaling_efficiency

        rows = scaling_efficiency(
            solver, n_poses=max(args.batch_sizes), key=jax.random.PRNGKey(args.seed),
            repeat_counts=tuple(args.repeat_counts), n_opt_steps_max=args.n_opt_steps_max,
            pos_error_threshold=EXACT_POS_TOL, rot_error_threshold=EXACT_ROT_TOL,
            allow_uninitialized=args.uninitialized,
        )
        for r in rows:
            print(json.dumps(r))
        return 0

    if args.compare:
        return _run_compare(args, solver)

    if args.megabatch:
        # Serving-scale streaming solve (BASELINE.json config 4 shape).
        import time as _time

        from ikflow_tpu.parallel.fleet import solve_exact_megabatch

        kp = jax.random.PRNGKey(args.seed)
        poses = np.asarray(robot.forward_kinematics(
            robot.sample_joint_angles(kp, args.megabatch, joint_limit_eps=0.02)
        ))
        capacity_policy = {"probe": "probe", "compact": "compact", "full": None}[args.capacity]
        common = dict(
            chunk_size=args.chunk_size, steady_chunk=args.steady_chunk,
            retry_capacities=capacity_policy,
            repeat_counts=tuple(args.repeat_counts), n_opt_steps_max=args.n_opt_steps_max,
            pos_error_threshold=EXACT_POS_TOL, rot_error_threshold=EXACT_ROT_TOL,
            allow_uninitialized=args.uninitialized,
        )
        # Warm-up = one full pass over the stream: compiles the probe, steady
        # and tail programs and populates the capacity cache.
        solve_exact_megabatch(solver, poses, **common)
        # Cold leg: fresh probe every call (first-request behavior).
        t0 = _time.time()
        _, valids = solve_exact_megabatch(
            solver, poses, progress=True, capacity_cache=False, **common
        )
        sec = _time.time() - t0
        # Warm leg: steady-state serving — cached capacities, no probe chunk.
        t0 = _time.time()
        _, valids_warm = solve_exact_megabatch(
            solver, poses, capacity_cache=True, **common
        )
        sec_warm = _time.time() - t0
        print(json.dumps({
            "mode": "exact_megabatch", "n": args.megabatch,
            "chunk_size": args.chunk_size, "steady_chunk": args.steady_chunk,
            "seconds": round(sec, 3), "sols_per_s": round(args.megabatch / sec, 1),
            "valid_fraction": round(float(valids.mean()), 4),
            "warm_seconds": round(sec_warm, 3),
            "warm_sols_per_s": round(args.megabatch / sec_warm, 1),
            "warm_valid_fraction": round(float(valids_warm.mean()), 4),
            "capacity": args.capacity,
        }))
        return 0

    key = jax.random.PRNGKey(args.seed)

    def emit(row):
        # Print immediately (flushed) so a truncated sweep keeps its completed rows.
        print(json.dumps(row), flush=True)

    for n in args.batch_sizes:
        kp, ks = jax.random.split(jax.random.fold_in(key, n))
        poses = robot.forward_kinematics(robot.sample_joint_angles(kp, n, joint_limit_eps=0.02))

        if args.mode in ("approx", "both"):
            if args.differencing:
                from ikflow_tpu.utils.benchtools import chained_approx_build
                from ikflow_tpu.utils.profiling import DegenerateTimingError, measure_per_iter_s

                build = chained_approx_build(solver, poses, ks, scale_iters=8)
                try:
                    # Wide deltas: small ones (5 iters) leave the differenced
                    # delta comparable to tunnel-RTT jitter (r4's 28% headline
                    # spread — see bench.py EXACT_K_DELTAS and DESIGN.md).
                    t = measure_per_iter_s(build, f"approx n={n}", k_deltas=(20, 80)) / 8.0
                    emit({"mode": "approx", "batch": n, "seconds": t,
                          "sols_per_s": n / t, "methodology": "differencing"})
                except DegenerateTimingError as e:
                    emit({"mode": "approx", "batch": n, "error": str(e)})
            else:
                def go_approx():
                    out = solver.generate_ik_solutions(poses, key=ks, allow_uninitialized=args.uninitialized)
                    out.block_until_ready()

                t = _timed(go_approx, args.k)
                emit({"mode": "approx", "batch": n, "seconds": t, "sols_per_s": n / t})

        if args.mode in ("exact", "both"):
            # Uncapped probe: compiles/warms the tier program AND measures the
            # per-tier miss rates that the capacity policy (--capacity probe)
            # turns into fixed retry-bucket sizes for the timed runs.
            _, probe_valids, tier_counts = solver.generate_exact_ik_solutions(
                poses,
                repeat_counts=tuple(args.repeat_counts),
                pos_error_threshold=EXACT_POS_TOL,
                rot_error_threshold=EXACT_ROT_TOL,
                n_opt_steps_max=args.n_opt_steps_max,
                key=ks,
                allow_uninitialized=args.uninitialized,
                return_tier_counts=True,
            )
            uncapped_vf = float(np.asarray(probe_valids).mean())
            capacities = None
            if args.capacity == "probe":
                from ikflow_tpu.solver import derive_retry_capacities

                capacities = derive_retry_capacities(
                    np.asarray(tier_counts), n, len(args.repeat_counts)
                )

            def go_exact():
                sols, valids = solver.generate_exact_ik_solutions(
                    poses,
                    repeat_counts=tuple(args.repeat_counts),
                    pos_error_threshold=EXACT_POS_TOL,
                    rot_error_threshold=EXACT_ROT_TOL,
                    n_opt_steps_max=args.n_opt_steps_max,
                    key=ks,
                    allow_uninitialized=args.uninitialized,
                    retry_capacities=capacities,
                )
                sols.block_until_ready()
                return valids

            valids = go_exact()  # compile/warm the (possibly capped) timed program
            row_common = {
                "valid_fraction": float(np.asarray(valids).mean()),
                "uncapped_valid_fraction": uncapped_vf,
                "capacity": list(capacities) if capacities else "full",
            }
            if args.differencing:
                from ikflow_tpu.utils.benchtools import chained_exact_build
                from ikflow_tpu.utils.profiling import DegenerateTimingError, measure_per_iter_s

                build = chained_exact_build(
                    solver, poses, ks, repeat_counts=tuple(args.repeat_counts),
                    pos_tol=EXACT_POS_TOL, rot_tol=EXACT_ROT_TOL,
                    n_opt_steps_max=args.n_opt_steps_max, capacities=capacities,
                )
                try:
                    t = measure_per_iter_s(build, f"exact n={n}", k_deltas=(20, 80))
                    emit({
                        "mode": "exact", "batch": n, "seconds": t, "sols_per_s": n / t,
                        "methodology": "differencing", **row_common,
                    })
                except DegenerateTimingError as e:
                    emit({"mode": "exact", "batch": n, "error": str(e)})
            else:
                t = _timed(lambda: go_exact(), args.k)
                emit({
                    "mode": "exact", "batch": n, "seconds": t, "sols_per_s": n / t,
                    **row_common,
                })

    return 0
