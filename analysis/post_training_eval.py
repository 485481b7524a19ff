"""Post-training evaluation battery for a trained deploy artifact.

Runs on the accelerator:
1. accuracy protocol (500 poses x 50 sols, latent scale 0.75 — evaluate.py parity)
2. exact-IK validity/runtime at the benchmark tolerance vs LM step budget
3. xla vs pallas backend A/B for the flow inverse
4. capacity-capped tier timing

Usage: python analysis/post_training_eval.py --weights ~/.cache/ikflow_tpu/models/panda__full.npz
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import argparse
import json
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--n_accuracy", type=int, default=500)
    parser.add_argument("--n_exact", type=int, default=1000)
    parser.add_argument("--pallas", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver
    from ikflow_tpu.training.checkpoints import load_deploy

    # Architecture from the deploy header.
    z = np.load(args.weights)
    header = json.loads(bytes(z["__header__"]).decode())
    hp = FlowHyperParams.from_dict(header["hyper_parameters"])
    robot = get_robot(header["robot_name"])
    solver = IKFlowSolver(hp, robot, use_pallas=args.pallas)
    params, _ = load_deploy(args.weights, solver.params)
    solver.set_params(params)
    print(f"loaded {args.weights}: robot={robot.name} step={header.get('global_step')}")

    key = jax.random.PRNGKey(0)

    # 1. Accuracy protocol.
    k1, k2 = jax.random.split(key)
    testset = robot.forward_kinematics(
        robot.sample_joint_angles(k1, args.n_accuracy, joint_limit_eps=0.02)
    )
    m = 50
    poses_t = jnp.repeat(testset, m, axis=0)
    sols = solver.generate_ik_solutions(poses_t, latent_scale=0.75, key=k2)
    ev = solver.evaluate(poses_t, sols)
    print(json.dumps({
        "protocol": "accuracy_500x50_scale0.75",
        "mean_l2_error_mm": round(1000 * float(jnp.mean(ev.pos_errors)), 3),
        "mean_angular_error_deg": round(float(jnp.rad2deg(jnp.mean(ev.rot_errors))), 3),
        "pct_joint_limits_exceeded": round(100 * float(jnp.mean(ev.joint_limits_exceeded.astype(jnp.float32))), 2),
        "pct_self_colliding": round(100 * float(jnp.mean(ev.self_colliding.astype(jnp.float32))), 2),
    }))

    # 2-4. Exact-IK sweeps.
    targets = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.fold_in(key, 3), args.n_exact, joint_limit_eps=0.02)
    )

    def timed_solve(tag, **kw):
        def go(k):
            s, v = solver.generate_exact_ik_solutions(
                targets, pos_error_threshold=1e-3, rot_error_threshold=0.01, key=k, **kw
            )
            s.block_until_ready()
            return v
        v = go(jax.random.fold_in(key, 10))
        ts = []
        for i in range(3):
            t0 = time.time()
            go(jax.random.fold_in(key, 11 + i))
            ts.append(time.time() - t0)
        sec = sorted(ts)[1]
        print(json.dumps({
            "protocol": tag, "valid_fraction": round(float(np.asarray(v).mean()), 4),
            "seconds": round(sec, 4), "sols_per_s": round(args.n_exact / sec, 1),
        }))

    for steps in (2, 3, 5):
        timed_solve(f"exact_steps{steps}_full", repeat_counts=(1, 3, 10), n_opt_steps_max=steps)
    timed_solve("exact_steps3_capped", repeat_counts=(1, 3, 10), n_opt_steps_max=3,
                retry_capacities=(1.0, 0.25, 0.0625))
    timed_solve("exact_steps5_capped", repeat_counts=(1, 3, 10), n_opt_steps_max=5,
                retry_capacities=(1.0, 0.25, 0.0625))

    # 5. Pallas numerical equivalence on the REAL accelerator with trained
    # weights. The test suite only exercises the fused kernel in interpret
    # mode on CPU (tests/test_fleet.py); this is the hardware-lowering check.
    # TPU-only: the kernel's VMEM block specs cannot lower on CPU/GPU.
    if jax.default_backend() == "tpu":
        nv = min(1024, targets.shape[0])
        padded = solver.flow.pad_params_for_pallas(params)
        zs = jax.random.normal(jax.random.fold_in(key, 20), (nv, solver.flow.D))
        cond = jnp.concatenate(
            [targets[:nv], jnp.zeros((nv, solver.flow.dim_cond - 7))], axis=1
        )
        q_xla = solver.flow.inverse(params, zs, cond)[0][:, : robot.ndof]
        q_pl = solver.flow.inverse_fused(padded, zs, cond)[:, : robot.ndof]
        from ikflow_tpu.lm import config_pose_errors as pose_errors

        pe_x, _ = pose_errors(robot, robot.clamp_to_joint_limits(q_xla), targets[:nv])
        pe_p, _ = pose_errors(robot, robot.clamp_to_joint_limits(q_pl), targets[:nv])
        print(json.dumps({
            "protocol": "pallas_vs_xla_numerics",
            "max_abs_q_diff": float(jnp.max(jnp.abs(q_xla - q_pl))),
            "mean_pos_err_mm_xla": round(1000 * float(jnp.mean(pe_x)), 4),
            "mean_pos_err_mm_pallas": round(1000 * float(jnp.mean(pe_p)), 4),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
