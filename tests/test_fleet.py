"""Fleet-solve and Pallas-path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.flow import build_flow, tiny_model_params
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import IKFlowSolver


def test_solve_exact_sharded_pads_and_matches_shapes():
    from ikflow_tpu.parallel.fleet import solve_exact_sharded

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 37))
    sols, valids = solve_exact_sharded(
        solver, poses, key=jax.random.PRNGKey(1), repeat_counts=(1, 2),
        n_opt_steps_max=2, allow_uninitialized=True,
    )
    assert sols.shape == (37, 7) and valids.shape == (37,)


def test_solve_exact_megabatch_streams_ragged_chunks():
    """Megabatch streaming: ragged tail padded to the compiled chunk shape,
    results written back at the right offsets, valid solutions actually valid."""
    from ikflow_tpu.lm import config_pose_errors
    from ikflow_tpu.parallel.fleet import solve_exact_megabatch

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 50))
    sols, valids = solve_exact_megabatch(
        solver, poses, chunk_size=16, key=jax.random.PRNGKey(1),
        repeat_counts=(2,), n_opt_steps_max=25, allow_uninitialized=True,
    )
    assert sols.shape == (50, 7) and valids.shape == (50,)
    assert valids.dtype == bool and valids.any(), "no pose converged with a generous budget"
    pos_err, rot_err = config_pose_errors(robot, jnp.asarray(sols[valids]), poses[valids])
    assert float(jnp.max(pos_err)) < 1e-3 + 1e-6
    assert float(jnp.max(rot_err)) < 0.1 + 1e-6


def test_scaling_harness_rows():
    from ikflow_tpu.parallel.fleet import scaling_efficiency

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    rows = scaling_efficiency(
        solver, n_poses=32, reps=1, device_counts=(1, None),
        repeat_counts=(1,), n_opt_steps_max=1, allow_uninitialized=True,
    )
    assert len(rows) == 2
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == len(jax.devices())
    for r in rows:
        assert r["sols_per_s"] > 0


def test_pallas_fused_inverse_matches_jnp_interpret():
    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    padded = flow.pad_params_for_pallas(params)
    z = jax.random.normal(jax.random.PRNGKey(1), (37, flow.D))
    cond = jnp.zeros((37, flow.dim_cond))
    ref, _ = flow.inverse(params, z, cond)
    fused = flow.inverse_fused(padded, z, cond, tile_b=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=1e-4)
