"""Solver tests: LM convergence, exact-IK contract, determinism, evaluation.

Mirrors the reference's solver tests (``/root/reference/tests/ikflow_solver_test.py``)
with an untrained (random-weight) flow: the machinery contract — full
convergence under generous retry budgets, determinism under fixed latents —
must hold without trained weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.flow import tiny_model_params
from ikflow_tpu.lm import config_pose_errors as pose_errors, lm_step, refine
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import IKFlowSolver, draw_latent


def _make_solver(robot_name="panda", D=8):
    hp = tiny_model_params()
    hp.dim_latent_space = D
    robot = get_robot(robot_name)
    return IKFlowSolver(hp, robot, seed=0)


def _random_reachable_poses(robot, key, n):
    return robot.forward_kinematics(robot.sample_joint_angles(key, n, joint_limit_eps=0.05))


# ---------------------------------------------------------------------------
# LM refinement.
# ---------------------------------------------------------------------------


def test_lm_converges_from_perturbed_solution():
    robot = get_robot("panda")
    key = jax.random.PRNGKey(0)
    q_true = robot.sample_joint_angles(key, 256, joint_limit_eps=0.1)
    targets = robot.forward_kinematics(q_true)
    q = q_true + 0.1 * jax.random.normal(jax.random.PRNGKey(1), q_true.shape)
    q = robot.clamp_to_joint_limits(q)
    for _ in range(6):
        q = lm_step(robot, q, targets)
    pos_err, rot_err = pose_errors(robot, q, targets)
    frac = float(((pos_err < 1e-3) & (rot_err < 0.01)).mean())
    assert frac > 0.95, f"LM only converged {frac:.1%} from near seeds"


def test_refine_first_valid_wins_capture():
    robot = get_robot("panda")
    q_true = robot.sample_joint_angles(jax.random.PRNGKey(2), 64, joint_limit_eps=0.1)
    targets = robot.forward_kinematics(q_true)
    q0 = robot.clamp_to_joint_limits(q_true + 0.05 * jax.random.normal(jax.random.PRNGKey(3), q_true.shape))
    cap_q, cap_valid, _ = refine(robot, q0, targets, n_steps=8, pos_tol=1e-3, rot_tol=0.01)
    # Captured solutions must themselves satisfy the tolerance.
    pos_err, rot_err = pose_errors(robot, cap_q, targets)
    valid_mask = np.asarray(cap_valid)
    assert valid_mask.mean() > 0.9
    assert (np.asarray(pos_err)[valid_mask] < 1e-3).all()
    assert (np.asarray(rot_err)[valid_mask] < 0.01).all()


# ---------------------------------------------------------------------------
# Approximate IK.
# ---------------------------------------------------------------------------


def test_generate_ik_solutions_shapes_and_limits():
    solver = _make_solver()
    robot = solver.robot
    target = _random_reachable_poses(robot, jax.random.PRNGKey(4), 1)[0]
    sols = solver.generate_ik_solutions(target, n=50, allow_uninitialized=True)
    assert sols.shape == (50, robot.ndof)
    low, high = np.asarray(robot.limits_low()), np.asarray(robot.limits_high())
    s = np.asarray(sols)
    assert (s >= low - 1e-6).all() and (s <= high + 1e-6).all()


def test_generate_ik_solutions_batched_poses():
    solver = _make_solver()
    targets = _random_reachable_poses(solver.robot, jax.random.PRNGKey(5), 32)
    sols = solver.generate_ik_solutions(targets, allow_uninitialized=True)
    assert sols.shape == (32, solver.robot.ndof)


def test_determinism_same_latent_same_solution():
    """Equal (pose, latent) -> equal solutions; different pose, same latent ->
    different solutions (``ikflow_solver_test.py:89-117``)."""
    solver = _make_solver()
    robot = solver.robot
    poses = _random_reachable_poses(robot, jax.random.PRNGKey(6), 8)
    latent = draw_latent(jax.random.PRNGKey(7), "gaussian", 1.0, (8, solver.network_width))
    s1 = solver.generate_ik_solutions(poses, latent=latent, allow_uninitialized=True)
    s2 = solver.generate_ik_solutions(poses, latent=latent, allow_uninitialized=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    poses_b = _random_reachable_poses(robot, jax.random.PRNGKey(8), 8)
    s3 = solver.generate_ik_solutions(poses_b, latent=latent, allow_uninitialized=True)
    assert float(jnp.abs(s1 - s3).max()) > 1e-4


def test_return_detailed():
    solver = _make_solver()
    targets = _random_reachable_poses(solver.robot, jax.random.PRNGKey(9), 16)
    sols, pos_e, rot_e, jl, sc = solver.generate_ik_solutions(
        targets, return_detailed=True, allow_uninitialized=True
    )
    assert sols.shape == (16, solver.robot.ndof)
    for arr in (pos_e, rot_e, jl, sc):
        assert arr.shape == (16,)
    assert jl.dtype == bool and sc.dtype == bool
    assert np.isfinite(np.asarray(pos_e)).all()


def test_uninitialized_guard():
    solver = _make_solver()
    target = _random_reachable_poses(solver.robot, jax.random.PRNGKey(10), 1)[0]
    try:
        solver.generate_ik_solutions(target, n=4)
        raise RuntimeError("should have asserted")
    except AssertionError as e:
        assert "weights" in str(e)


# ---------------------------------------------------------------------------
# Exact IK — the headline contract.
# ---------------------------------------------------------------------------


def test_exact_ik_contract_full_convergence():
    """All poses must converge to 1 mm / 0.01 rad with solutions inside joint
    limits (``ikflow_solver_test.py:56-87``; n scaled down for CI, tolerance
    identical, untrained flow compensated by a larger LM budget)."""
    solver = _make_solver()
    robot = solver.robot
    n = 100
    targets = _random_reachable_poses(robot, jax.random.PRNGKey(11), n)
    sols, valids = solver.generate_exact_ik_solutions(
        targets,
        repeat_counts=(1, 3, 10),
        pos_error_threshold=1e-3,
        rot_error_threshold=0.01,
        n_opt_steps_max=40,
        key=jax.random.PRNGKey(12),
        allow_uninitialized=True,
    )
    assert sols.shape == (n, robot.ndof)
    valid_frac = float(np.asarray(valids).mean())
    assert valid_frac == 1.0, f"only {valid_frac:.1%} of poses converged"
    pos_err, rot_err = pose_errors(robot, sols, targets)
    assert float(pos_err.max()) < 1e-3
    assert float(rot_err.max()) < 0.01
    low, high = np.asarray(robot.limits_low()), np.asarray(robot.limits_high())
    s = np.asarray(sols)
    assert (s >= low - 1e-6).all() and (s <= high + 1e-6).all()


def test_exact_ik_invalid_poses_marked():
    """Unreachable poses must come back valid=False, not crash or lie."""
    solver = _make_solver()
    robot = solver.robot
    targets = _random_reachable_poses(robot, jax.random.PRNGKey(13), 8)
    # Push 4 poses far outside the workspace.
    targets = targets.at[:4, :3].set(jnp.array([5.0, 5.0, 5.0]))
    sols, valids = solver.generate_exact_ik_solutions(
        targets, repeat_counts=(1, 3), n_opt_steps_max=6,
        key=jax.random.PRNGKey(14), allow_uninitialized=True,
    )
    v = np.asarray(valids)
    assert not v[:4].any(), "unreachable poses reported valid"


def test_exact_ik_deterministic_under_key():
    solver = _make_solver()
    targets = _random_reachable_poses(solver.robot, jax.random.PRNGKey(15), 16)
    k = jax.random.PRNGKey(16)
    s1, v1 = solver.generate_exact_ik_solutions(
        targets, repeat_counts=(1, 3), n_opt_steps_max=6, key=k, allow_uninitialized=True
    )
    s2, v2 = solver.generate_exact_ik_solutions(
        targets, repeat_counts=(1, 3), n_opt_steps_max=6, key=k, allow_uninitialized=True
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


# ---------------------------------------------------------------------------
# Capacity-capped retry tiers.
# ---------------------------------------------------------------------------


def test_capacity_capped_tiers_preserve_and_extend_validity():
    """The fixed-shape compaction retry (argsort invalid-first, fixed bucket)
    must (a) never lose a tier-1 solution, (b) retry invalid poses first, and
    (c) match the uncapped run's final validity when the bucket covers every
    miss. Uses an untrained flow with generous LM budgets so tier-1 leaves a
    mix of valid/invalid poses."""
    solver = _make_solver()
    robot = solver.robot
    poses = _random_reachable_poses(robot, jax.random.PRNGKey(3), 48)
    key = jax.random.PRNGKey(4)

    kwargs = dict(
        repeat_counts=(1, 4), pos_error_threshold=1e-3, rot_error_threshold=0.01,
        n_opt_steps_max=12, key=key, allow_uninitialized=True,
    )
    sols_full, valid_full = solver.generate_exact_ik_solutions(poses, **kwargs)
    # Capacity 1.0 on the retry tier = same work as uncapped, via the
    # compaction path; identical keys -> identical latents -> same results.
    sols_cap, valid_cap = solver.generate_exact_ik_solutions(
        poses, retry_capacities=(1.0, 1.0), **kwargs
    )
    np.testing.assert_array_equal(np.asarray(valid_full), np.asarray(valid_cap))

    # A tight bucket may converge fewer poses but must never report a pose
    # valid without its solution actually solving it, and tier-1 validity is
    # a lower bound (already-valid poses are never evicted).
    sols_t1, valid_t1 = solver.generate_exact_ik_solutions(
        poses, repeat_counts=(1,), pos_error_threshold=1e-3,
        rot_error_threshold=0.01, n_opt_steps_max=12, key=key,
        allow_uninitialized=True,
    )
    sols_small, valid_small = solver.generate_exact_ik_solutions(
        poses, retry_capacities=(1.0, 0.25), **kwargs
    )
    assert np.asarray(valid_small).sum() >= np.asarray(valid_t1).sum()
    ev = solver.evaluate(poses, sols_small)
    pe = np.asarray(ev.pos_errors)[np.asarray(valid_small)]
    re_ = np.asarray(ev.rot_errors)[np.asarray(valid_small)]
    assert (pe <= 1e-3 + 1e-6).all() and (re_ <= 0.01 + 1e-6).all()


def test_generate_diverse_ik_solutions_beats_raw_draw():
    """Farthest-point selection must (a) return n in-limit solutions for the
    pose, (b) have strictly higher minimum pairwise spread than the first n
    raw candidates, and (c) never select the same candidate twice."""
    from ikflow_tpu.evaluation import solution_diversity
    from ikflow_tpu.flow import tiny_model_params

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    robot = get_robot("panda")
    solver = IKFlowSolver(hp, robot, seed=0)
    pose = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 1))[0]
    key = jax.random.PRNGKey(3)
    n = 8
    diverse = solver.generate_diverse_ik_solutions(
        pose, n=n, oversample=8, key=key, allow_uninitialized=True
    )
    raw = solver.generate_ik_solutions(pose, n=n, key=key, allow_uninitialized=True)
    assert diverse.shape == (n, robot.ndof)
    assert not bool(np.asarray(robot.joint_limits_exceeded(diverse)).any())
    d = np.asarray(diverse)
    pair_min = lambda a: min(
        np.linalg.norm(a[i] - a[j]) for i in range(len(a)) for j in range(i + 1, len(a))
    )
    assert pair_min(d) > 1e-6, "duplicate candidates selected"
    assert pair_min(d) >= pair_min(np.asarray(raw)), "selection did not improve spread"
    assert float(solution_diversity(jnp.asarray(d), 1, n)[0]) >= float(
        solution_diversity(jnp.asarray(raw), 1, n)[0]
    )
