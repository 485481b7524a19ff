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


def test_return_tier_counts_cumulative_and_consistent():
    solver = _solver()
    robot = solver.robot
    targets = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.PRNGKey(4), 32, joint_limit_eps=0.05)
    )
    sols, valids, tier_counts = solver.generate_exact_ik_solutions(
        targets, repeat_counts=(1, 3, 10), n_opt_steps_max=20, rot_error_threshold=0.01,
        key=jax.random.PRNGKey(5), allow_uninitialized=True, return_tier_counts=True,
    )
    tc = np.asarray(tier_counts)
    assert tc.shape == (3,)
    assert (np.diff(tc) >= 0).all(), "cumulative tier counts must be monotone"
    assert int(tc[-1]) == int(np.asarray(valids).sum())


def test_derive_retry_capacities_invariants():
    from ikflow_tpu.solver import derive_retry_capacities

    # 3% miss after tier 1, 0.5% after tier 2 -> capped tiers with 2x headroom.
    caps = derive_retry_capacities([970, 995, 1000], 1000, 3)
    assert caps is not None and caps[0] == 1.0
    assert caps[1] >= 2 * 0.03 - 1e-9 and caps[1] < 0.10
    assert caps[2] >= 32 / 1000  # min-bucket floor
    # >40% tier-1 miss -> uncapped (None).
    assert derive_retry_capacities([500, 900, 1000], 1000, 3) is None
    # Tiny n: the 32-pose floor caps at full width, never above.
    caps = derive_retry_capacities([15, 16, 16], 16, 3)
    assert caps is None or all(c <= 1.0 for c in caps)


def test_megabatch_probe_policy_preserves_validity():
    """solve_exact_megabatch's default 'probe' policy must converge the same
    poses as an explicit uncapped run (within key-to-key noise)."""
    from ikflow_tpu.parallel.fleet import solve_exact_megabatch

    solver = _solver()
    robot = solver.robot
    poses = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.PRNGKey(6), 96, joint_limit_eps=0.05)
    )
    kwargs = dict(
        chunk_size=32, key=jax.random.PRNGKey(7), repeat_counts=(1, 3),
        n_opt_steps_max=25, rot_error_threshold=0.01, allow_uninitialized=True,
    )
    _, v_probe = solve_exact_megabatch(solver, poses, retry_capacities="probe", **kwargs)
    _, v_full = solve_exact_megabatch(solver, poses, retry_capacities=None, **kwargs)
    assert v_probe.mean() >= v_full.mean() - 0.05
