"""Capacity-capped retry tier tests."""

import jax
import numpy as np

from ikflow_tpu.flow import tiny_model_params
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import IKFlowSolver


def _solver():
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    return IKFlowSolver(hp, get_robot("panda"), seed=0)


def test_capped_tiers_match_contract_when_capacity_sufficient():
    solver = _solver()
    robot = solver.robot
    targets = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.PRNGKey(0), 64, joint_limit_eps=0.05)
    )
    sols, valids = solver.generate_exact_ik_solutions(
        targets, repeat_counts=(1, 3, 10), n_opt_steps_max=40, rot_error_threshold=0.01,
        key=jax.random.PRNGKey(1), allow_uninitialized=True,
        retry_capacities=(1.0, 1.0, 0.5),
    )
    assert float(np.asarray(valids).mean()) > 0.95
    from ikflow_tpu.lm import config_pose_errors as pose_errors

    pe, re_ = pose_errors(robot, sols, targets)
    v = np.asarray(valids)
    assert np.asarray(pe)[v].max() < 1e-3
    assert np.asarray(re_)[v].max() < 0.01


def test_capped_tiers_validate_inputs():
    solver = _solver()
    robot = solver.robot
    targets = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(2), 8))
    try:
        solver.generate_exact_ik_solutions(
            targets, repeat_counts=(1, 3), retry_capacities=(0.5, 0.5),
            allow_uninitialized=True, key=jax.random.PRNGKey(3),
        )
        raise RuntimeError("should have asserted")
    except AssertionError as e:
        assert "first tier" in str(e)
