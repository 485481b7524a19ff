"""Robot-layer tests: golden FK values, Jacobian correctness, sampling,
joint limits, self-collision machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.robots import get_robot, robot_names


def test_panda_zero_config_golden_pose():
    """Reference golden value: /root/reference/tests/evaluation_utils_test.py:21-24."""
    panda = get_robot("panda")
    pose = np.asarray(panda.forward_kinematics(jnp.zeros((1, 7))))[0]
    golden = np.array([0.088, 0.0, 0.926, 0.0, 0.92387953, 0.38268343, 0.0])
    np.testing.assert_allclose(pose[:3], golden[:3], atol=1e-5)
    # Quaternion sign ambiguity: compare up to sign. Tolerance 5e-5: float32
    # accumulation through 9 frame compositions (reference uses 1e-5 on torch f32).
    err = min(np.abs(pose[3:] - golden[3:]).max(), np.abs(pose[3:] + golden[3:]).max())
    assert err < 5e-5


@pytest.mark.parametrize("name", robot_names())
def test_fk_batched_and_finite(name):
    robot = get_robot(name)
    key = jax.random.PRNGKey(0)
    q = robot.sample_joint_angles(key, 32)
    poses = robot.forward_kinematics(q)
    assert poses.shape == (32, 7)
    assert np.isfinite(np.asarray(poses)).all()
    # Unit quaternions with non-negative w.
    norms = np.linalg.norm(np.asarray(poses[:, 3:]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert (np.asarray(poses[:, 3]) >= -1e-7).all()


@pytest.mark.parametrize("name", robot_names())
def test_jacobian_matches_finite_difference(name):
    robot = get_robot(name)
    q = robot.sample_joint_angles(jax.random.PRNGKey(1), 8, joint_limit_eps=0.05)
    pose, J = robot.fk_pose_and_jacobian(q)
    assert J.shape == (8, 6, robot.ndof)

    # Finite-difference check of the positional block.
    eps = 1e-5
    q_np = np.asarray(q, dtype=np.float64)
    for j in range(robot.ndof):
        dq = np.zeros_like(q_np)
        dq[:, j] = eps
        p_plus = np.asarray(robot.forward_kinematics(jnp.asarray(q_np + dq, dtype=jnp.float32)))[:, :3]
        p_minus = np.asarray(robot.forward_kinematics(jnp.asarray(q_np - dq, dtype=jnp.float32)))[:, :3]
        fd = (p_plus - p_minus) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, :3, j]), fd, atol=2e-2, rtol=1e-2)


def test_rotational_jacobian_small_rotation():
    """J_rot predicts the relative rotation vector for a small joint step."""
    from ikflow_tpu.math import quat_conjugate, quat_log_map, quat_mul

    robot = get_robot("panda")
    q = robot.sample_joint_angles(jax.random.PRNGKey(2), 4, joint_limit_eps=0.05)
    pose0, J = robot.fk_pose_and_jacobian(q)
    dq = 1e-4 * jax.random.normal(jax.random.PRNGKey(3), q.shape)
    pose1 = robot.forward_kinematics(q + dq)
    # Relative rotation quaternion: q1 * conj(q0); its log ~ J_rot @ dq.
    rel = quat_mul(pose1[:, 3:], quat_conjugate(pose0[:, 3:]))
    omega = quat_log_map(rel)
    pred = jnp.einsum("nij,nj->ni", J[:, 3:, :], dq)
    np.testing.assert_allclose(np.asarray(omega), np.asarray(pred), atol=1e-6)


@pytest.mark.parametrize("name", robot_names())
def test_sampling_within_limits(name):
    robot = get_robot(name)
    eps = 0.004363  # reference margin, /root/reference/scripts/build_dataset.py:186
    q = np.asarray(robot.sample_joint_angles(jax.random.PRNGKey(4), 1000, joint_limit_eps=eps))
    low = np.asarray(robot.limits_low()) + eps
    high = np.asarray(robot.limits_high()) - eps
    assert (q >= low - 1e-6).all() and (q <= high + 1e-6).all()
    # Non-degenerate per-column spread (reference asserts stddev > 0.001,
    # /root/reference/scripts/build_dataset.py:118-120).
    assert (q.std(axis=0) > 0.001).all()


def test_clamp_to_joint_limits():
    robot = get_robot("panda")
    low = np.asarray(robot.limits_low())
    high = np.asarray(robot.limits_high())
    q = jnp.asarray(np.stack([low - 1.0, (low + high) / 2, high + 1.0]), dtype=jnp.float32)
    out = np.asarray(robot.clamp_to_joint_limits(q))
    np.testing.assert_allclose(out[0], low, atol=1e-6)
    np.testing.assert_allclose(out[2], high, atol=1e-6)
    np.testing.assert_allclose(out[1], (low + high) / 2, atol=1e-6)


def test_joint_limits_exceeded_truth_table():
    """Mirror of /root/reference/tests/evaluation_utils_test.py:34-55."""
    from ikflow_tpu.robots.chain import Joint, KinematicChain, REVOLUTE

    chain = KinematicChain(
        "tiny3",
        [
            Joint("j1", (0, 0, 0.1), (0, 0, 0), (0, 0, 1), REVOLUTE, (-1, 1)),
            Joint("j2", (0, 0, 0.1), (0, 0, 0), (0, 0, 1), REVOLUTE, (-2, 2)),
            Joint("j3", (0, 0, 0.1), (0, 0, 0), (0, 0, 1), REVOLUTE, (-3, 3)),
        ],
    )
    configs = jnp.array(
        [[0, 0, 0], [0, 0, 0], [-2, 0, 0], [0, -1.999, 0], [0, 2.0001, 0]], dtype=jnp.float32
    )
    out = np.asarray(chain.joint_limits_exceeded(configs))
    np.testing.assert_array_equal(out, [False, False, True, False, True])


def test_panda_self_collision_sane():
    robot = get_robot("panda")
    # Known-valid reference poses are collision free: the joint-range center
    # and the Franka "ready" pose. NOTE: the clamped-zero pose is NOT valid —
    # MuJoCo's mesh narrow-phase confirms q6=0 folds the hand onto the
    # forearm (a real self-collision the r1/r2 skeleton capsules missed).
    q_center = 0.5 * (robot.limits_low() + robot.limits_high())[None, :]
    q_ready = jnp.array([[0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]])
    assert not bool(robot.config_self_collides(q_center)[0])
    assert not bool(robot.config_self_collides(q_ready)[0])
    # The clamped-zero hand-on-forearm fold must be DETECTED.
    q_zero = robot.clamp_to_joint_limits(jnp.zeros((1, 7)))
    assert bool(robot.config_self_collides(q_zero)[0])
    # Random configs: some collide, most don't.
    q = robot.sample_joint_angles(jax.random.PRNGKey(5), 2000)
    rate = float(np.asarray(robot.config_self_collides(q)).mean())
    assert 0.005 < rate < 0.8, f"implausible self-collision rate {rate}"


def test_sample_joint_angles_and_poses_filtered():
    robot = get_robot("panda")
    q, poses = robot.sample_joint_angles_and_poses(
        jax.random.PRNGKey(6), 512, joint_limit_eps=0.01, only_non_self_colliding=True
    )
    assert q.shape == (512, 7) and poses.shape == (512, 7)
    rate = float(np.asarray(robot.config_self_collides(q)).mean())
    assert rate < 0.02, f"filtered batch still has {rate:.1%} collisions"


def test_fk_deterministic():
    robot = get_robot("panda")
    q = robot.sample_joint_angles(jax.random.PRNGKey(7), 16)
    p1 = np.asarray(robot.forward_kinematics(q))
    p2 = np.asarray(robot.forward_kinematics(q))
    np.testing.assert_array_equal(p1, p2)


def test_filtered_sampling_raises_on_oversample_shortfall():
    """only_non_self_colliding with an insufficient oversample budget must
    raise instead of silently returning colliding configs."""
    robot = get_robot("panda")
    key = jax.random.PRNGKey(7)
    # Force a shortfall: ask for every row of a 1x oversampled batch to be
    # collision-free; panda uniform sampling collides a few percent of the
    # time, so some rows in 4096 are essentially guaranteed to collide.
    try:
        robot.sample_joint_angles_and_poses(
            key, 4096, only_non_self_colliding=True, oversample_factor=1
        )
        raise AssertionError("expected ValueError on oversample shortfall")
    except ValueError as e:
        assert "oversample_factor" in str(e)


def test_rizon4_fk_golden_regression_lock():
    """Locks the (datasheet-approximate) Rizon4 chain: exact URDF frames are
    unobtainable in this environment (no egress, no jrl/flexiv_description),
    so instead of jrl parity this pins the authored chain's FK so any future
    kinematics edit — including swapping in real URDF origins — is a visible,
    deliberate diff (see robots/library.py module doc, Rizon4 entry)."""
    robot = get_robot("rizon4")
    zero = np.asarray(robot.forward_kinematics(jnp.zeros((1, 7))))[0]
    np.testing.assert_allclose(
        zero, [0.0, -0.44, 0.831, 1.0, 0.0, 0.0, 0.0], atol=1e-6
    )
    q = jnp.asarray([[0.3, -0.5, 0.7, -1.1, 0.4, 0.9, -0.2]])
    pose = np.asarray(robot.forward_kinematics(q))[0]
    np.testing.assert_allclose(
        pose,
        [0.50300497, -0.10561575, 0.49862957, 0.79441923, 0.13066661, 0.40710703, 0.43137947],
        atol=1e-5,
    )
