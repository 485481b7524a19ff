"""Training subsystem tests: loss semantics, optimizer plumbing, dataset
generation, short-run loss decrease, checkpoint round-trips."""

import os
import tempfile

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.flow import build_flow, tiny_model_params
from ikflow_tpu.robots import get_robot
from ikflow_tpu.training import (
    IkDataset,
    TrainConfig,
    Trainer,
    build_dataset,
    load_dataset,
    make_loss_fn,
    make_optimizer,
    save_dataset,
)
from ikflow_tpu.training.loss import get_softflow_noise


def _setup(D=9, n=256):
    hp = tiny_model_params()
    hp.dim_latent_space = D
    robot = get_robot("panda")
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    q = robot.sample_joint_angles(jax.random.PRNGKey(1), n, joint_limit_eps=0.01)
    poses = robot.forward_kinematics(q)
    return hp, robot, flow, params, q, poses


def test_softflow_noise_semantics():
    x = jnp.zeros((1000, 9))
    c, v = get_softflow_noise(jax.random.PRNGKey(0), x, 0.01)
    assert c.shape == (1000, 1) and v.shape == x.shape
    cn = np.asarray(c)
    assert (cn >= 0).all() and (cn <= 1).all()
    # noise magnitude scales with c.
    ratio = np.abs(np.asarray(v)).mean(axis=1)
    hi = ratio[cn[:, 0] > 0.8].mean()
    lo = ratio[cn[:, 0] < 0.2].mean()
    assert hi > 3 * lo


def test_loss_finite_and_differentiable():
    hp, robot, flow, params, q, poses = _setup()
    loss_fn = make_loss_fn(flow, robot.ndof)
    loss, metrics = loss_fn(params, jax.random.PRNGKey(2), q, poses)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(2), q, poses)[0])(params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms) and max(norms) > 0


def test_optimizers_step():
    hp, robot, flow, params, q, poses = _setup()
    loss_fn = make_loss_fn(flow, robot.ndof)
    for name in ("adamw", "adam", "adadelta", "ranger"):
        opt = make_optimizer(name, learning_rate=1e-3, step_lr_every=10, gamma=0.5)
        state = opt.init(params)
        g = jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(3), q, poses)[0])(params)
        updates, state = opt.update(g, state, params)
        import optax

        new_params = optax.apply_updates(params, updates)
        delta = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(new_params))
        )
        assert delta > 0, f"{name} produced a no-op update"


def test_lr_schedule_steps_per_optimizer_step():
    from ikflow_tpu.training.optimizers import make_lr_schedule

    sched = make_lr_schedule(1e-4, 0.5, 100)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(99)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 2.5e-5, rtol=1e-6)


def test_build_save_load_dataset():
    robot = get_robot("panda")
    ds = build_dataset(robot, training_set_size=2000, test_set_size=500, chunk_size=4096)
    assert ds.samples_tr.shape == (2000, 7) and ds.endpoints_tr.shape == (2000, 7)
    assert ds.samples_te.shape == (500, 7)
    # non-self-colliding filter applied
    rate = float(np.asarray(robot.config_self_collides(jnp.asarray(ds.samples_tr))).mean())
    assert rate == 0.0
    # FK consistency: endpoints match FK of samples
    fk = np.asarray(robot.forward_kinematics(jnp.asarray(ds.samples_tr[:64])))
    np.testing.assert_allclose(fk, ds.endpoints_tr[:64], atol=1e-5)

    with tempfile.TemporaryDirectory() as d:
        out = save_dataset(ds, directory=os.path.join(d, "panda_ds"))
        assert os.path.exists(os.path.join(out, "dataset.npz"))
        assert os.path.exists(os.path.join(out, "info.txt"))


def test_build_dataset_resident_device_only():
    """Resident builder: same semantics as build_dataset with zero host pulls
    for the train split — in-limit, non-self-colliding, FK-consistent,
    deterministic in the seed, and directly trainable via fit_on_device."""
    robot = get_robot("panda")
    from ikflow_tpu.training import build_dataset_resident

    ds = build_dataset_resident(robot, training_set_size=3000, test_set_size=200, chunk_size=1024, call_size=1280)
    assert isinstance(ds.samples_tr, jax.Array)  # never left the device
    assert ds.samples_tr.shape == (3000, 7) and ds.endpoints_tr.shape == (3000, 7)
    assert ds.samples_te.shape == (200, 7)
    q = jnp.asarray(ds.samples_tr)
    assert float(robot.config_self_collides(q).mean()) == 0.0
    low, high = robot.limits_low(), robot.limits_high()
    assert bool(((q >= low) & (q <= high)).all())
    fk = np.asarray(robot.forward_kinematics(q[:64]))
    np.testing.assert_allclose(fk, np.asarray(ds.endpoints_tr[:64]), atol=1e-5)
    # Deterministic in the seed (watchdog restarts regenerate identical data).
    ds2 = build_dataset_resident(robot, training_set_size=3000, test_set_size=200, chunk_size=1024, call_size=1280)
    np.testing.assert_array_equal(np.asarray(ds.samples_tr), np.asarray(ds2.samples_tr))

    cfg = TrainConfig(n_steps=20, batch_size=128, log_every=0, eval_every=0, checkpoint_every=0)
    hp = tiny_model_params()
    hp.dim_latent_space = max(robot.ndof, 8)
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        trainer = Trainer(flow, robot, cfg, log_dir=d)
        _, metrics = trainer.fit_on_device(params, ds, steps_per_call=10)
    assert metrics["step"] == 20 and np.isfinite(metrics["tr/loss"])


def test_short_training_run_loss_decreases():
    hp, robot, flow, params, q, poses = _setup()
    ds = build_dataset(robot, training_set_size=4096, test_set_size=256, chunk_size=4096)
    cfg = TrainConfig(n_steps=60, batch_size=256, log_every=10, eval_every=0, learning_rate=2e-4)
    with tempfile.TemporaryDirectory() as d:
        trainer = Trainer(flow, robot, cfg, log_dir=d)
        loss_fn = make_loss_fn(flow, robot.ndof)
        loss0 = float(loss_fn(params, jax.random.PRNGKey(9), q, poses)[0])
        new_params, metrics = trainer.fit(params, ds)
        loss1 = float(loss_fn(new_params, jax.random.PRNGKey(9), q, poses)[0])
        assert loss1 < loss0, f"loss did not decrease: {loss0} -> {loss1}"
        # JSONL metrics written with the reference taxonomy.
        lines = open(os.path.join(d, "metrics.jsonl")).read().strip().splitlines()
        assert len(lines) >= 5
        import json

        rec = json.loads(lines[-1])
        for k in ("tr/loss", "tr/grad_max", "tr/output_std", "tr/learning_rate"):
            assert k in rec


def test_validation_metrics_taxonomy():
    hp, robot, flow, params, q, poses = _setup()
    ds = IkDataset(
        np.asarray(q), np.asarray(poses), np.asarray(q[:32]), np.asarray(poses[:32]), "panda"
    )
    cfg = TrainConfig(val_set_size=8, samples_per_pose=10)
    trainer = Trainer(flow, robot, cfg)
    out = trainer.validate(params, ds, jax.random.PRNGKey(4), step=0)
    for k in (
        "val/l2_error_mm",
        "val/angular_error_deg",
        "val/pct_joint_limits_exceeded",
        "val/pct_self_colliding",
        "val_clamped/l2_error_mm",
        "val_clamped/pct_joint_limits_exceeded",
    ):
        assert k in out and np.isfinite(out[k])
    assert out["val_clamped/pct_joint_limits_exceeded"] == 0.0


def test_checkpoint_roundtrip():
    from ikflow_tpu.training.checkpoints import (
        export_deploy,
        latest_checkpoint_step,
        load_deploy,
        restore_checkpoint,
        save_checkpoint,
    )
    from ikflow_tpu.flow.params import tiny_model_params as tmp_params

    hp, robot, flow, params, q, poses = _setup()
    with tempfile.TemporaryDirectory() as d:
        ckpt_dir = os.path.join(d, "ckpts")
        save_checkpoint(ckpt_dir, 100, params)
        assert latest_checkpoint_step(ckpt_dir) == 100
        restored, step = restore_checkpoint(ckpt_dir, template={"params": params})
        assert step == 100
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Deploy export/load round-trip.
        deploy = os.path.join(d, "model.npz")
        export_deploy(deploy, params, hp, "panda", global_step=100)
        params2, header = load_deploy(deploy, params)
        assert header["robot_name"] == "panda"
        assert header["hyper_parameters"]["nb_nodes"] == hp.nb_nodes
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # fp16 storage: half the bytes, loads back as the model dtype with
        # <= half-ulp-of-fp16 quantization error per weight.
        deploy16 = os.path.join(d, "model16.npz")
        export_deploy(deploy16, params, hp, "panda", global_step=100, dtype="float16")
        assert os.path.getsize(deploy16) < 0.65 * os.path.getsize(deploy)
        params3, header16 = load_deploy(deploy16, params)
        assert header16["stored_dtype"] == "float16"
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params3)):
            a, b = np.asarray(a), np.asarray(b)
            assert b.dtype == a.dtype
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_registry_listing_and_errors():
    from ikflow_tpu import config
    from ikflow_tpu.registry import get_all_model_names, get_ik_solver

    names = get_all_model_names()
    assert "panda__full__lp191_5.25m" in names
    try:
        get_ik_solver("nope")
        raise RuntimeError("should have raised")
    except ValueError as e:
        assert "unknown model" in str(e)
    # No weights on disk -> helpful error unless allow_uninitialized. Redirect
    # the whole models search path (cache dir AND repo-shipped models/) to an
    # empty dir so trained weights on this machine don't flip the outcome.
    saved = config.MODELS_DIR
    saved_search = config.MODEL_SEARCH_DIRS
    with tempfile.TemporaryDirectory() as d:
        config.MODELS_DIR = d
        config.MODEL_SEARCH_DIRS = (d,)
        try:
            get_ik_solver("panda__full__lp191_5.25m")
            raise RuntimeError("should have raised")
        except FileNotFoundError as e:
            assert "train" in str(e).lower()
        # Still inside the redirected search path: allow_uninitialized builds
        # a weightless solver even when no artifact exists anywhere.
        try:
            solver, hp = get_ik_solver("panda_lite_tpm", allow_uninitialized=True)
        finally:
            config.MODELS_DIR = saved
            config.MODEL_SEARCH_DIRS = saved_search
    assert solver.robot.name == "panda"
    assert hp.nb_nodes == 6 and hp.dim_latent_space == 7
    # Registry-level flag only tolerates the missing weights file; generating
    # from random weights still needs the per-call opt-in (two distinct
    # consents, matching the reference's ikflow_solver.py:264 flag).
    y = np.zeros((2, 7), np.float32)
    y[:, 3] = 1.0
    try:
        solver.generate_ik_solutions(y)
        raise RuntimeError("should have asserted on unloaded weights")
    except AssertionError:
        pass
    sols = solver.generate_ik_solutions(y, allow_uninitialized=True)
    assert sols.shape == (2, 7)


def test_fit_reports_actual_step_and_schedule_count_lr():
    """fit/fit_on_device return metrics['step'] = step actually reached, and
    the logged LR follows the optimizer's internal schedule count (which
    restarts at 0 when a resume resets opt_state) rather than the global step."""
    hp, robot, flow, params, q, poses = _setup(D=8, n=128)
    ds = IkDataset(np.asarray(q), np.asarray(poses), np.asarray(q)[:16], np.asarray(poses)[:16], "panda")
    cfg = TrainConfig(n_steps=4, batch_size=64, log_every=1, eval_every=0, checkpoint_every=0,
                      step_lr_every=1, gamma=0.5, learning_rate=1e-3)
    trainer = Trainer(flow, robot, cfg)

    _, metrics = trainer.fit(params, ds)
    assert metrics["step"] == 4

    # Simulated resume-with-reset-opt_state: global step starts at 2 but the
    # optimizer schedule count starts at 0 -> logged LR must be the initial LR
    # (schedule(count~0..1)), not the decayed schedule(global_step).
    fresh_opt = trainer.optimizer.init(params)
    _, metrics2 = trainer.fit(params, ds, start_step=2, opt_state=fresh_opt)
    assert metrics2["step"] == 4
    lr_logged = metrics2["tr/learning_rate"]
    # After 2 steps from a fresh opt_state the count is 2 -> lr = 1e-3 * 0.5^2;
    # a global-step-derived value would be 1e-3 * 0.5^4 (and the pre-fix code
    # logged schedule(step=3) = 1e-3 * 0.5^3 at the last log). Allow either of
    # the count-consistent values around the final log point.
    assert lr_logged > 1e-3 * 0.5**3 + 1e-9, (
        f"LR {lr_logged} looks global-step-derived, not schedule-count-derived"
    )


def test_fit_on_device_time_budget_reports_early_step():
    hp, robot, flow, params, q, poses = _setup(D=8, n=128)
    ds = IkDataset(np.asarray(q), np.asarray(poses), np.asarray(q)[:16], np.asarray(poses)[:16], "panda")
    cfg = TrainConfig(n_steps=10_000, batch_size=64, log_every=5, eval_every=0, checkpoint_every=0)
    trainer = Trainer(flow, robot, cfg)
    _, metrics = trainer.fit_on_device(params, ds, steps_per_call=5, time_budget_s=0.0)
    # Budget of 0 stops after the first window: step == steps_per_call.
    assert metrics["step"] == 5
    assert metrics["step"] < cfg.n_steps


def test_warmup_schedule_ramps_then_decays():
    from ikflow_tpu.training.optimizers import make_lr_schedule

    sched = make_lr_schedule(1e-3, 0.5, 100, warmup_steps=50)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(25)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50)), 1e-3, rtol=1e-5)
    # Decay restarts its own count at the warmup boundary.
    np.testing.assert_allclose(float(sched(50 + 100)), 5e-4, rtol=1e-5)
    # warmup_steps=0 keeps the plain stepped decay.
    plain = make_lr_schedule(1e-3, 0.5, 100, warmup_steps=0)
    np.testing.assert_allclose(float(plain(0)), 1e-3, rtol=1e-6)


def test_export_deploy_quality_gate():
    """Diverged weights must not ship silently (r2 fetch__large incident)."""
    from ikflow_tpu.training.checkpoints import (
        DeployQualityError,
        export_deploy,
        load_deploy,
    )

    hp, robot, flow, params, q, poses = _setup()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.npz")
        # Over-gate value refuses.
        with pytest.raises(DeployQualityError):
            export_deploy(path, params, hp, "panda",
                          quality={"val_l2_error_mm": 427.6}, max_val_l2_mm=100.0)
        # Non-finite refuses (the r2 run's own metrics said Infinity).
        with pytest.raises(DeployQualityError):
            export_deploy(path, params, hp, "panda",
                          quality={"val_l2_error_mm": float("inf")}, max_val_l2_mm=100.0)
        # Missing quality refuses when a gate is requested.
        with pytest.raises(DeployQualityError):
            export_deploy(path, params, hp, "panda", quality=None, max_val_l2_mm=100.0)
        assert not os.path.exists(path)
        # Passing value exports and self-describes.
        export_deploy(path, params, hp, "panda",
                      quality={"val_l2_error_mm": 7.9}, max_val_l2_mm=100.0)
        _, header = load_deploy(path, params)
        assert header["quality"]["val_l2_error_mm"] == pytest.approx(7.9)
        assert header["quality_gate_mm"] == 100.0
        # Gate off (forced) ships a bad artifact but records the bad number.
        forced = os.path.join(d, "forced.npz")
        export_deploy(forced, params, hp, "panda",
                      quality={"val_l2_error_mm": 427.6}, max_val_l2_mm=None)
        _, fheader = load_deploy(forced, params)
        assert fheader["quality"]["val_l2_error_mm"] == pytest.approx(427.6)


def test_export_deploy_warm_start_provenance():
    """A warm-started anneal's artifact must self-describe its cumulative
    training depth: global_step stays the run's own step count (gate/resume
    semantics unchanged) while header['warm_start'] carries prior/total."""
    from ikflow_tpu.training.checkpoints import export_deploy, load_deploy

    hp, robot, flow, params, q, poses = _setup()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.npz")
        export_deploy(
            path, params, hp, "panda", global_step=500_000,
            warm_start={"from": "rizon4__full.npz", "prior_steps": 200_000,
                        "total_steps": 700_000},
        )
        _, header = load_deploy(path, params)
        assert header["global_step"] == 500_000
        assert header["warm_start"] == {
            "from": "rizon4__full.npz", "prior_steps": 200_000,
            "total_steps": 700_000,
        }
        # Cold exports carry no warm_start key at all (absence == cold).
        cold = os.path.join(d, "cold.npz")
        export_deploy(cold, params, hp, "panda", global_step=100)
        _, cheader = load_deploy(cold, params)
        assert "warm_start" not in cheader


def test_gradient_clip_by_global_norm():
    """gradient_clip_algorithm='norm' bounds the global step length: with a
    huge gradient the applied update's norm is exactly the clip threshold
    (optax.clip_by_global_norm), while 'value' clips per element (so the
    global norm of the update scales with sqrt(n_params))."""
    import jax
    import jax.numpy as jnp

    params = {"w": jnp.zeros((64,)), "b": jnp.zeros((8,))}
    grads = jax.tree_util.tree_map(lambda p: 100.0 * jnp.ones_like(p), params)

    def update_norm(algorithm):
        opt = make_optimizer("adam", learning_rate=1.0, gamma=1.0, step_lr_every=10,
                             gradient_clip=1.0, gradient_clip_algorithm=algorithm)
        state = opt.init(params)
        # Inspect the clipped gradient before the optimizer core normalizes it:
        # apply only the clip stage by measuring through a plain SGD core.
        opt_sgd = make_optimizer("adam", 1.0, 1.0, 10, 1.0, 0, algorithm)
        del opt_sgd
        clip = (__import__("optax").clip_by_global_norm(1.0) if algorithm == "norm"
                else __import__("optax").clip(1.0))
        clipped, _ = clip.update(grads, clip.init(params), params)
        leaves = jax.tree_util.tree_leaves(clipped)
        return float(jnp.sqrt(sum(jnp.sum(g * g) for g in leaves))), opt, state

    norm_n, opt_n, state_n = update_norm("norm")
    norm_v, _, _ = update_norm("value")
    assert abs(norm_n - 1.0) < 1e-5
    assert norm_v > 5.0  # sqrt(72) ~ 8.5 with every element at the 1.0 ceiling
    # And the full optimizer built with the norm algorithm steps without error.
    updates, _ = opt_n.update(grads, state_n, params)
    assert all(jnp.isfinite(u).all() for u in jax.tree_util.tree_leaves(updates))

    try:
        make_optimizer("adam", gradient_clip_algorithm="bogus")
        raise RuntimeError("should have raised")
    except ValueError as e:
        assert "gradient_clip_algorithm" in str(e)


def test_train_cli_init_npz_warm_start(tmp_path, capsys):
    """``train --init_npz`` warm-starts params from a deploy artifact (the
    orbax-free path for annealing a shipped model; reference role:
    ``scripts/train_from_checkpoint.py``)."""
    from ikflow_tpu.cli.main import main

    hp, robot, flow, params, q, poses = _setup(D=8)
    deploy = str(tmp_path / "warm.npz")
    # The fixture tag may have a cached dataset from a previous run (the cache
    # dir is shared state); purge it so the generation+save path always runs
    # and the save-directory assertion below is deterministic.
    import shutil

    from ikflow_tpu.training.dataset import dataset_directory

    shutil.rmtree(dataset_directory("panda", ("tiny-warmstart-fixture",)), ignore_errors=True)
    from ikflow_tpu.training.checkpoints import export_deploy

    export_deploy(deploy, params, hp, "panda", global_step=123,
                  quality={"val_l2_error_mm": 5.0})
    rc = main([
        "train", "--robot_name", "panda", "--nb_nodes", "3",
        "--dim_latent_space", "8", "--coeff_fn_config", "2",
        "--coeff_fn_internal_size", "256", "--init_npz", deploy,
        "--dataset_size", "1024", "--n_steps", "4", "--batch_size", "64",
        "--eval_every", "1000", "--log_every", "2", "--checkpoint_every", "0",
        "--val_set_size", "8", "--run_dir", str(tmp_path / "run"),
        "--dataset_tags", "tiny-warmstart-fixture",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "warm-started from deploy artifact" in out
    assert "previously trained to step 123" in out
    # The generation fallback must save under the REQUESTED tag directory —
    # saving under the default tags let a tiny run clobber the default cache
    # that a later full-size run silently loads (round-4 live incident).
    assert "tag0=tiny-warmstart-fixture" in out, out

    # Wrong-robot artifact must fail loudly, not train silently.
    export_deploy(str(tmp_path / "wrong.npz"), params, hp, "fetch", global_step=1)
    with pytest.raises(ValueError, match="deploy artifact is for robot"):
        main([
            "train", "--robot_name", "panda", "--nb_nodes", "3",
            "--dim_latent_space", "8", "--coeff_fn_config", "2",
            "--coeff_fn_internal_size", "256",
            "--init_npz", str(tmp_path / "wrong.npz"),
            "--dataset_size", "1024", "--n_steps", "2", "--batch_size", "64",
            "--run_dir", str(tmp_path / "run2"),
            "--dataset_tags", "tiny-warmstart-fixture",
        ])
