"""Multi-device tests on the virtual 8-device CPU mesh: sharded training step,
sharded exact-IK, and 1-chip == N-chip numerics (SURVEY.md §4 additions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.flow import build_flow, tiny_model_params
from ikflow_tpu.parallel import DATA_AXIS, make_mesh, shard_batch
from ikflow_tpu.robots import get_robot
from ikflow_tpu.training import IkDataset, TrainConfig, Trainer, make_loss_fn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(n=64):
    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    q = robot.sample_joint_angles(jax.random.PRNGKey(1), n, joint_limit_eps=0.01)
    poses = robot.forward_kinematics(q)
    return robot, hp, flow, params, q, poses


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_loss_identical_sharded_vs_single():
    """1 chip == 8 chips numerics for the training loss."""
    robot, hp, flow, params, q, poses = _setup()
    loss_fn = make_loss_fn(flow, robot.ndof)
    key = jax.random.PRNGKey(2)
    loss_single, _ = jax.jit(loss_fn)(params, key, q, poses)

    mesh = make_mesh()
    qs, ps = shard_batch(mesh, q, poses)
    loss_sharded, _ = jax.jit(loss_fn)(params, key, qs, ps)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=2e-5)


def test_sharded_training_step_runs_and_improves():
    robot, hp, flow, params, q, poses = _setup(n=512)
    ds = IkDataset(np.asarray(q), np.asarray(poses), np.asarray(q[:64]), np.asarray(poses[:64]), "panda")
    mesh = make_mesh()
    cfg = TrainConfig(n_steps=30, batch_size=256, log_every=10, eval_every=0, checkpoint_every=0, learning_rate=2e-4)
    trainer = Trainer(flow, robot, cfg, mesh=mesh)
    loss_fn = make_loss_fn(flow, robot.ndof)
    l0 = float(loss_fn(params, jax.random.PRNGKey(5), q, poses)[0])
    new_params, metrics = trainer.fit(params, ds)
    l1 = float(loss_fn(new_params, jax.random.PRNGKey(5), q, poses)[0])
    assert np.isfinite(metrics["tr/loss"])
    assert l1 < l0


def test_sharded_exact_ik_matches_unsharded():
    """Exact-IK on sharded inputs returns identical results to unsharded."""
    from ikflow_tpu.solver import IKFlowSolver

    robot, hp, flow, params, q, poses = _setup(n=32)
    solver = IKFlowSolver(hp, robot, params=params)
    k = jax.random.PRNGKey(3)
    s1, v1 = solver.generate_exact_ik_solutions(
        poses, repeat_counts=(1, 2), n_opt_steps_max=3, key=k
    )
    mesh = make_mesh()
    poses_sharded = shard_batch(mesh, poses)
    s2, v2 = solver.generate_exact_ik_solutions(
        poses_sharded, repeat_counts=(1, 2), n_opt_steps_max=3, key=k
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_graft_entry_compiles_and_dryrun():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    jax.jit(fn).lower(*args).compile()
    mod.dryrun_multichip(8)


def test_initialize_multihost_single_process_noop(monkeypatch):
    """Without cluster env markers the auto-detect path must be a true no-op:
    jax.distributed.initialize is never called (calling it on a plain machine
    can block on coordinator connect or side-effect the whole session)."""
    from ikflow_tpu.parallel import mesh

    for m in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_JOB_ID",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(m, raising=False)

    def _boom(*a, **k):
        raise AssertionError("jax.distributed.initialize must not be called")

    monkeypatch.setattr(jax.distributed, "initialize", _boom)
    mesh.initialize_multihost()  # no cluster env -> silent no-op
    assert jax.process_count() == 1


def test_initialize_multihost_marker_triggers_autodetect(monkeypatch):
    """A cluster env marker routes into jax.distributed.initialize(), and
    failures there surface instead of being swallowed."""
    from ikflow_tpu.parallel import mesh

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: calls.append((a, k)))

    # Single-process-shaped markers must NOT trigger init: a dev image sets
    # TPU_WORKER_HOSTNAMES=localhost, and a 1-task SLURM job sets SLURM_JOB_ID.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("SLURM_JOB_ID", "123")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    mesh.initialize_multihost()
    assert calls == []

    monkeypatch.setenv("SLURM_NTASKS", "4")
    mesh.initialize_multihost()
    assert calls == [((), {})]

    calls.clear()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    mesh.initialize_multihost()
    assert calls == [((), {})]

    def _fail(*a, **k):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", _fail)
    try:
        mesh.initialize_multihost()
        raise AssertionError("expected the init failure to surface")
    except RuntimeError as e:
        assert "coordinator" in str(e)
