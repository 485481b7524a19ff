"""``ikflow-tpu train`` — train a conditional flow for a robot.

Parity: ``/root/reference/scripts/train.py`` (same flag names/defaults:
optimizer adamw, lr 1e-4, batch 512, gamma 0.9795, eval/log cadences in steps).
Additions: ``--smoke`` for a tiny end-to-end run, ``--resume`` from orbax
checkpoints (replacing ``train_from_checkpoint.py``'s wandb-artifact pull),
``--export`` deploy artifact on completion, ``--data_parallel`` to shard the
batch over all visible devices.
"""

from __future__ import annotations

import argparse
import os
import time


def add_parser(sub):
    p = sub.add_parser("train", help="train an IKFlow model")
    p.add_argument("--robot_name", type=str, required=True)
    # Model params (train.py:111-155 / IkflowModelParameters defaults).
    p.add_argument("--coupling_layer", type=str, default="glow")
    p.add_argument("--nb_nodes", type=int, default=12)
    p.add_argument("--dim_latent_space", type=int, default=9)
    p.add_argument("--coeff_fn_config", type=int, default=3)
    p.add_argument("--coeff_fn_internal_size", type=int, default=1024)
    p.add_argument("--rnvp_clamp", type=float, default=2.5)
    p.add_argument("--softflow_noise_scale", type=float, default=0.001)
    p.add_argument("--disable_softflow", action="store_true")
    p.add_argument("--sigmoid_on_output", action="store_true")
    # Training params (train.py:24-56).
    p.add_argument("--optimizer", type=str, default="adamw", choices=["adamw", "adam", "adadelta", "ranger"])
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--gamma", type=float, default=0.9795)
    p.add_argument("--step_lr_every", type=int, default=int(2.5e6 / 64))
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup steps (stabilizes 16-block stacks at large batch)")
    p.add_argument("--gradient_clip_val", type=float, default=1.0)
    p.add_argument("--gradient_clip_algorithm", type=str, default="value",
                   choices=["value", "norm"],
                   help="'value' = per-element clip (reference lt_model.py:220-221 parity); "
                        "'norm' = optax.clip_by_global_norm, bounds total step length — "
                        "the fix for rare catastrophic loss spikes on deep stacks at "
                        "large batch (see docs/DESIGN.md, fetch training notes)")
    p.add_argument("--n_steps", type=int, default=250_000)
    p.add_argument("--eval_every", type=int, default=20_000)
    p.add_argument("--log_every", type=int, default=1_000)
    p.add_argument("--checkpoint_every", type=int, default=50_000)
    p.add_argument("--val_set_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset_tags", nargs="*", default=["non-self-colliding"])
    # Ops.
    p.add_argument("--smoke", action="store_true", help="tiny model + tiny run (CI)")
    p.add_argument("--resume", type=str, default=None, help="checkpoint dir to resume from")
    p.add_argument("--init_npz", type=str, default=None,
                   help="warm-start params from a deploy .npz artifact (optimizer state and "
                        "step counter start fresh — use for annealing a shipped model when "
                        "orbax checkpoints are gone; reference role: train_from_checkpoint.py)")
    p.add_argument("--export", type=str, default=None, help="deploy .npz path to write at the end")
    p.add_argument("--export_dtype", type=str, default=None,
                   help="storage dtype for the deploy artifact (e.g. float16; halves the file, "
                        "cast back to model dtype at load)")
    p.add_argument("--export_gate_mm", type=float, default=None,
                   help="refuse the deploy export if final val l2 error exceeds this (mm). "
                        "Default: resolved from the central per-model policy "
                        "(model_descriptions.yaml export_gate_mm, backstop 100), always "
                        "tightened by the no-regression rule against an existing target "
                        "artifact's quality header (checkpoints.resolve_export_gate)")
    p.add_argument("--export_force", action="store_true",
                   help="bypass the export quality gate (the header still records the bad metric)")
    p.add_argument("--run_dir", type=str, default=None)
    p.add_argument("--data_parallel", action="store_true", help="shard batch over all devices")
    p.add_argument("--bf16_hidden", action="store_true", help="bfloat16 hidden matmuls (MXU)")
    p.add_argument("--on_device_data", action="store_true",
                   help="resident dataset + scanned steps (no per-batch host transfer)")
    p.add_argument("--steps_per_call", type=int, default=200)
    p.add_argument("--time_budget_s", type=float, default=None,
                   help="stop at the first window boundary past this wall-clock budget")
    p.add_argument("--dataset_size", type=int, default=2_500_000)
    p.add_argument("--wandb", action="store_true",
                   help="also log to wandb when the library is available (JSONL is always written)")
    p.add_argument("--wandb_project", type=str, default="ikflow-tpu")
    p.set_defaults(func=run)
    return p


def run(args: argparse.Namespace) -> int:
    if args.data_parallel:
        # Must run before ANY jax op initializes a backend. Marker-gated:
        # silent no-op on a plain single-process machine, joins the cluster
        # (after which jax.devices() spans all hosts) on SLURM/TPU-pod nodes.
        from ikflow_tpu.parallel import initialize_multihost

        initialize_multihost()

    import jax

    from ikflow_tpu.config import TRAINING_LOGS_DIR, ensure_cache_dirs
    from ikflow_tpu.flow import FlowHyperParams, build_flow
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training import TrainConfig, Trainer, build_dataset, load_dataset
    from ikflow_tpu.training.checkpoints import export_deploy, restore_checkpoint

    hp = FlowHyperParams()
    hp.coupling_layer = args.coupling_layer
    hp.nb_nodes = args.nb_nodes
    hp.dim_latent_space = args.dim_latent_space
    hp.coeff_fn_config = args.coeff_fn_config
    hp.coeff_fn_internal_size = args.coeff_fn_internal_size
    hp.rnvp_clamp = args.rnvp_clamp
    hp.softflow_noise_scale = args.softflow_noise_scale
    hp.softflow_enabled = not args.disable_softflow
    hp.sigmoid_on_output = args.sigmoid_on_output
    hp.bf16_hidden = args.bf16_hidden

    cfg = TrainConfig(
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        gamma=args.gamma,
        step_lr_every=args.step_lr_every,
        warmup_steps=args.warmup_steps,
        gradient_clip=args.gradient_clip_val,
        gradient_clip_algorithm=args.gradient_clip_algorithm,
        n_steps=args.n_steps,
        eval_every=args.eval_every,
        log_every=args.log_every,
        checkpoint_every=args.checkpoint_every,
        val_set_size=args.val_set_size,
        seed=args.seed,
    )

    robot = get_robot(args.robot_name)

    if args.smoke:
        hp.nb_nodes, hp.coeff_fn_config, hp.coeff_fn_internal_size = 3, 2, 256
        hp.dim_latent_space = max(robot.ndof, 8)
        cfg.n_steps, cfg.eval_every, cfg.log_every, cfg.checkpoint_every = 200, 100, 20, 0
        cfg.batch_size, cfg.val_set_size = 256, 16
        dataset = build_dataset(robot, training_set_size=8192, test_set_size=512, chunk_size=8192)
    else:
        assert hp.dim_latent_space >= robot.ndof, (
            f"dim_latent_space ({hp.dim_latent_space}) must be >= ndof ({robot.ndof})"
        )
        try:
            dataset = load_dataset(args.robot_name, tuple(args.dataset_tags))
        except FileNotFoundError:
            print(f"dataset not found; generating {args.dataset_size} samples on-device")
            # The generated dataset must carry the REQUESTED tags: filtering
            # follows the tag set, and the saved copy must land in the same
            # tag directory load_dataset will probe on a watchdog restart —
            # otherwise a small run's save clobbers the default-tag cache and
            # later runs silently load it (caught live in round 4: a 1024-row
            # verification dataset was loaded by a 25M-sample training run).
            import dataclasses

            from ikflow_tpu.config import DATASET_TAG_NON_SELF_COLLIDING

            only_nsc = DATASET_TAG_NON_SELF_COLLIDING in args.dataset_tags
            if args.on_device_data and not args.data_parallel:
                # Resident path: the dataset is generated AND consumed on
                # device — zero host round-trip (over a tunneled TPU, pulling
                # 25M samples to the host measures in hours). Deterministic in
                # the seed, so watchdog restarts regenerate identical data in
                # seconds instead of reloading from disk.
                from ikflow_tpu.training.dataset import build_dataset_resident

                dataset = build_dataset_resident(
                    robot, training_set_size=args.dataset_size,
                    only_non_self_colliding=only_nsc,
                )
                dataset = dataclasses.replace(dataset, tags=tuple(args.dataset_tags))
            else:
                dataset = build_dataset(
                    robot, training_set_size=args.dataset_size,
                    only_non_self_colliding=only_nsc,
                )
                dataset = dataclasses.replace(dataset, tags=tuple(args.dataset_tags))
                # Persist so watchdog restarts / resumed runs skip regeneration
                # (generation is minutes at the 2.5M default over a tunnel).
                from ikflow_tpu.training.dataset import save_dataset

                print(f"saved dataset to {save_dataset(dataset)}")

    ensure_cache_dirs()
    run_dir = args.run_dir or os.path.join(
        TRAINING_LOGS_DIR, f"{args.robot_name}__{time.strftime('%Y%m%d_%H%M%S')}"
    )
    ckpt_dir = os.path.join(run_dir, "checkpoints")

    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(cfg.seed))
    start_step = 0
    opt_state = None
    warm_start = None  # anneal provenance; survives --resume via config.json
    if args.resume:
        from ikflow_tpu.training.optimizers import make_optimizer

        opt_template = make_optimizer(
            cfg.optimizer, cfg.learning_rate, cfg.gamma, cfg.step_lr_every,
            cfg.gradient_clip, cfg.warmup_steps, cfg.gradient_clip_algorithm,
        ).init(params)
        try:
            restored, start_step = restore_checkpoint(
                args.resume, template={"params": params, "opt_state": opt_template}
            )
            opt_state = restored.get("opt_state")
        except Exception:
            restored, start_step = restore_checkpoint(args.resume, template={"params": params})
        params = restored["params"]
        print(f"resumed from {args.resume} at step {start_step} "
              f"(opt_state {'restored' if opt_state is not None else 'reset'})")
    elif args.init_npz:
        from ikflow_tpu.training.checkpoints import load_deploy

        params, deploy_header = load_deploy(args.init_npz, params)
        if deploy_header.get("robot_name") != robot.name:
            raise ValueError(
                f"deploy artifact is for robot {deploy_header.get('robot_name')!r}, "
                f"not {robot.name!r}"
            )
        # Shape-invariant hyperparameters must match too: params loaded under a
        # different output head / clamp / softflow setting would pass the leaf
        # shape check but train a different model than the artifact describes.
        # (softflow_noise_scale is deliberately NOT checked: it is a
        # training-time conditioning knob an anneal may legitimately change.)
        artifact_hp = deploy_header.get("hyper_parameters", {})
        for field in ("sigmoid_on_output", "softflow_enabled", "rnvp_clamp",
                      "clamp_activation"):
            want, got = getattr(hp, field), artifact_hp.get(field, getattr(hp, field))
            if got != want:
                raise ValueError(
                    f"--init_npz hyperparameter mismatch: artifact has "
                    f"{field}={got!r} but the CLI flags build {field}={want!r}. "
                    f"Match the flags to the artifact, or convert the artifact "
                    f"(e.g. scripts_dev/convert_softflow_init.py for a "
                    f"softflow->sigmoid head change)."
                )
        warm_start = {
            "from": os.path.basename(args.init_npz),
            "prior_steps": int(deploy_header.get("global_step") or 0),
        }
        print(f"warm-started from deploy artifact {args.init_npz} "
              f"(previously trained to step {deploy_header.get('global_step')}; "
              f"optimizer state fresh, step counter restarts at 0)")

    mesh = None
    if args.data_parallel:
        from ikflow_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"data-parallel over {mesh.devices.size} devices")

    # Persist run config + dataset hash (parity: wandb config + dataset-hash
    # logging, lt_data.py:44-56 / train.py:197-199).
    import hashlib
    import json as _json

    from ikflow_tpu.training.dataset import dataset_directory

    os.makedirs(run_dir, exist_ok=True)
    ds_path = os.path.join(
        dataset_directory(args.robot_name, tuple(args.dataset_tags)), "dataset.npz"
    )
    ds_hash = None
    if os.path.exists(ds_path):
        h = hashlib.sha256()
        with open(ds_path, "rb") as f:
            while chunk := f.read(1 << 20):
                h.update(chunk)
        ds_hash = h.hexdigest()
    # Carry warm-start provenance across watchdog relaunches: a --resume
    # relaunch skips the --init_npz branch, so recover prior_steps from the
    # config.json the first launch wrote.
    config_path = os.path.join(run_dir, "config.json")
    if warm_start is None and os.path.exists(config_path):
        try:
            with open(config_path) as f:
                warm_start = _json.load(f).get("warm_start")
        except (OSError, ValueError):
            pass
    with open(config_path, "w") as f:
        _json.dump(
            {"hyper_parameters": hp.to_dict(), "train_config": vars(args), "dataset_sha256": ds_hash,
             "dataset_sizes": {"train": int(dataset.n_train), "test": int(dataset.samples_te.shape[0])},
             "warm_start": warm_start},
            f, indent=2, default=str,
        )

    metric_hook = None
    if args.wandb:
        from ikflow_tpu.training.wandb_compat import maybe_wandb_hook

        metric_hook = maybe_wandb_hook(
            args.wandb_project, os.path.basename(run_dir), {**hp.to_dict(), **vars(args)}
        )
        if metric_hook is None:
            print("wandb requested but not installed; continuing with JSONL only")

    trainer = Trainer(flow, robot, cfg, mesh=mesh, log_dir=run_dir, metric_hook=metric_hook)
    t0 = time.time()
    if args.on_device_data:
        params, metrics = trainer.fit_on_device(
            params, dataset, checkpoint_dir=ckpt_dir,
            steps_per_call=args.steps_per_call, time_budget_s=args.time_budget_s,
            opt_state=opt_state, start_step=start_step,
        )
    else:
        params, metrics = trainer.fit(
            params, dataset, checkpoint_dir=ckpt_dir, start_step=start_step, opt_state=opt_state
        )
    dt = time.time() - t0
    # metrics["step"] is the step actually reached — a --time_budget_s run can
    # stop well before n_steps, so never report cfg.n_steps as progress.
    end_step = int(metrics.get("step", start_step))
    steps_done = max(end_step - start_step, 0)
    if steps_done == 0:
        print(f"checkpoint already at/past n_steps ({start_step} >= {cfg.n_steps}); nothing to train")
    else:
        print(f"trained {steps_done} steps ({start_step} -> {end_step}) in {dt:.1f}s "
              f"({steps_done / max(dt, 1e-9):.1f} steps/s); "
              f"final tr/loss={metrics.get('tr/loss', float('nan')):.4f}; run dir: {run_dir}")

    if args.export:
        from ikflow_tpu.training.checkpoints import DeployQualityError, resolve_export_gate

        # Grade the final params so the artifact header carries its own
        # quality and the gate has a fresh number (the last periodic eval can
        # be up to eval_every steps stale).
        key = jax.random.PRNGKey(cfg.seed + 7)
        val = trainer.validate(params, dataset, key, end_step)
        quality = {
            "val_l2_error_mm": val.get("val/l2_error_mm", float("nan")),
            "val_angular_error_deg": val.get("val/angular_error_deg", float("nan")),
        }
        gate_mm, gate_source = resolve_export_gate(args.export, args.export_gate_mm)
        print(f"deploy gate: {gate_mm} mm ({gate_source})")
        # metrics["step"] is the step actually reached (a --time_budget_s run
        # can stop well before n_steps).
        try:
            ws = None
            if warm_start and warm_start.get("prior_steps"):
                ws = dict(warm_start)
                ws["total_steps"] = (
                    int(metrics.get("step", cfg.n_steps)) + int(ws["prior_steps"])
                )
            path = export_deploy(
                args.export, params, hp, robot.name,
                global_step=int(metrics.get("step", cfg.n_steps)),
                dtype=args.export_dtype,
                quality=quality,
                max_val_l2_mm=None if args.export_force else gate_mm,
                warm_start=ws,
            )
            print(f"exported deploy artifact -> {path} "
                  f"(val l2 {quality['val_l2_error_mm']:.2f} mm)")
        except DeployQualityError as e:
            print(f"EXPORT REFUSED: {e}")
            return 1
    return 0
