"""Multi-host (multi-process) smoke: DP training step + fleet exact-IK across
2 processes over the Gloo/DCN path.

This validates the SURVEY.md §2.5 multi-host design end-to-end on one machine:
each process owns 2 virtual CPU devices; ``jax.distributed.initialize`` builds
the 4-device global mesh; the training step's gradient all-reduce and the
exact-IK tier predicates cross process boundaries.

Launcher mode (default) spawns the two workers and checks their output:

    python analysis/multihost_smoke.py

Worker mode (internal): ``python analysis/multihost_smoke.py --worker <pid>``.
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import os
import subprocess
import sys

PORT = int(os.environ.get("IKFLOW_TPU_MH_PORT", "29531"))
N_PROC = 2
DEVICES_PER_PROC = 2


def worker(process_id: int) -> int:
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}", num_processes=N_PROC, process_id=process_id
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ikflow_tpu.flow import build_flow, tiny_model_params
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training import make_loss_fn
    from ikflow_tpu.training.optimizers import make_optimizer
    import optax

    n_global_devices = len(jax.devices())
    assert n_global_devices == N_PROC * DEVICES_PER_PROC, n_global_devices
    mesh = Mesh(np.array(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())
    batch_s = NamedSharding(mesh, P("data"))

    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))  # same seed everywhere -> identical replicas
    loss_fn = make_loss_fn(flow, robot.ndof)
    opt = make_optimizer("adamw", 1e-4, 0.5, 1000)
    opt_state = opt.init(params)

    # Each process contributes its local shard of the global batch.
    per_proc = 16
    n_global = per_proc * N_PROC
    key = jax.random.PRNGKey(100 + process_id)
    q_local = np.asarray(robot.sample_joint_angles(key, per_proc, joint_limit_eps=0.01))
    poses_local = np.asarray(robot.forward_kinematics(jnp.asarray(q_local)))
    q = jax.make_array_from_process_local_data(batch_s, q_local, (n_global, robot.ndof))
    poses = jax.make_array_from_process_local_data(batch_s, poses_local, (n_global, 7))

    @jax.jit
    def step(params, opt_state, k, q, poses):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, k, q, poses)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    params, opt_state, loss = step(params, opt_state, jax.device_put(jax.random.PRNGKey(7), rep), q, poses)
    print(f"[p{process_id}] train step ok, global loss={float(loss):.4f}", flush=True)

    # Fleet exact-IK across processes.
    from ikflow_tpu.solver import IKFlowSolver

    solver = IKFlowSolver(hp, robot, params=params)
    sols, valids = solver.generate_exact_ik_solutions(
        poses, repeat_counts=(1, 2), n_opt_steps_max=3, key=jax.device_put(jax.random.PRNGKey(8), rep)
    )
    sols.block_until_ready()
    from jax.experimental import multihost_utils

    valids_global = multihost_utils.process_allgather(valids, tiled=True)
    print(f"[p{process_id}] exact-IK ok on {n_global} cross-process poses "
          f"({float(np.asarray(valids_global).mean()):.0%} valid)", flush=True)
    return 0


def launcher() -> int:
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        lines = [l for l in out.splitlines() if l.startswith("[p")]
        print("\n".join(lines))
        if p.returncode != 0 or "exact-IK ok" not in out:
            ok = False
            print(f"worker {i} FAILED (rc={p.returncode}):\n{out[-2000:]}")
    print("MULTIHOST SMOKE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        raise SystemExit(worker(int(sys.argv[2])))
    raise SystemExit(launcher())
