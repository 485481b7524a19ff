"""Evaluation-module tests (reference evaluation_utils parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.evaluation import (
    evaluate_solutions,
    pose_errors,
    pose_errors_cm_deg,
    solution_pose_errors,
)
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import draw_latent


def test_solution_pose_errors_golden():
    """Reference golden case (/root/reference/tests/evaluation_utils_test.py:14-32):
    zero config vs pose [1,1,1,1,0,0,0] -> l2 = 1.35544..., ang = pi."""
    robot = get_robot("panda")
    target = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    solutions = jnp.zeros((1, 7))
    l2, ang = solution_pose_errors(robot, solutions, target)
    np.testing.assert_allclose(float(l2[0]), 1.355440887681938, atol=1e-5)
    np.testing.assert_allclose(float(ang[0]), np.pi, atol=5e-4)


def test_pose_errors_cm_deg_units():
    p1 = jnp.array([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
    p2 = jnp.array([[0.01, 0.0, 0.0, np.cos(np.pi / 8), np.sin(np.pi / 8), 0.0, 0.0]])
    cm, deg = pose_errors_cm_deg(p1, p2)
    np.testing.assert_allclose(float(cm[0]), 1.0, atol=1e-5)  # 1 cm
    np.testing.assert_allclose(float(deg[0]), 45.0, atol=1e-3)  # quarter-turn quat = 45 deg


def test_evaluate_solutions_bundle_shapes():
    robot = get_robot("panda")
    q = robot.sample_joint_angles(jax.random.PRNGKey(0), 16)
    targets = robot.forward_kinematics(q)
    ev = evaluate_solutions(robot, targets, q)
    # Solutions realized from their own targets: zero error.
    assert float(ev.pos_errors.max()) < 1e-5
    assert float(ev.rot_errors.max()) < 1e-3
    assert not bool(ev.joint_limits_exceeded.any())


def test_draw_latent_distributions():
    k = jax.random.PRNGKey(0)
    g = draw_latent(k, "gaussian", 2.0, (10000, 4))
    u = draw_latent(k, "uniform", 0.5, (10000, 4))
    assert abs(float(g.std()) - 2.0) < 0.05
    assert float(u.min()) >= -0.5 and float(u.max()) <= 0.5
    assert abs(float(u.mean())) < 0.02
    try:
        draw_latent(k, "cauchy", 1.0, (2, 2))
        raise RuntimeError("should have asserted")
    except AssertionError:
        pass


def test_limit_and_collision_wrappers_delegate():
    """Module-level wrappers must agree exactly with the chain methods they
    delegate to (single source of truth for limit semantics)."""
    from ikflow_tpu.evaluation import calculate_joint_limits_exceeded, calculate_self_collisions

    robot = get_robot("panda")
    q = robot.sample_joint_angles(jax.random.PRNGKey(3), 128)
    q = q.at[:8].add(10.0)  # push some configs far outside limits
    np.testing.assert_array_equal(
        np.asarray(calculate_joint_limits_exceeded(robot, q)),
        np.asarray(robot.joint_limits_exceeded(q)),
    )
    np.testing.assert_array_equal(
        np.asarray(calculate_self_collisions(robot, q)),
        np.asarray(robot.config_self_collides(q)),
    )
    assert bool(np.asarray(calculate_joint_limits_exceeded(robot, q))[:8].all())


def test_solution_diversity_zero_for_collapsed_and_exact_for_known_case():
    from ikflow_tpu.evaluation import solution_diversity

    # Mode-collapsed: identical samples per pose -> diversity exactly 0.
    base = jnp.tile(jnp.arange(7.0)[None, :], (3 * 4, 1))
    div = solution_diversity(base, n_poses=3, n_samples=4)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-7)

    # Known 2-sample case: mean pairwise distance == the one pair's distance.
    a = jnp.zeros((1, 7))
    b = jnp.ones((1, 7))
    sols = jnp.concatenate([a, b], axis=0)  # one pose, two samples
    div = solution_diversity(sols, n_poses=1, n_samples=2)
    np.testing.assert_allclose(np.asarray(div), np.sqrt(7.0), rtol=1e-6)

    # Permuting the samples within a pose leaves the metric unchanged.
    sols3 = jnp.concatenate([a, b, 2 * b], axis=0)
    sols3_perm = jnp.concatenate([2 * b, a, b], axis=0)
    np.testing.assert_allclose(
        np.asarray(solution_diversity(sols3, 1, 3)),
        np.asarray(solution_diversity(sols3_perm, 1, 3)),
        rtol=1e-6,
    )
