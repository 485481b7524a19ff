"""Native (C++) kinematics oracle tests: float64 golden values, agreement with
the XLA path, and the classical LM IK baseline."""

import numpy as np
import pytest

import jax

from ikflow_tpu.robots import get_robot, robot_names

native = pytest.importorskip("ikflow_tpu.robots.native_oracle")
if not native.native_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def panda_oracle():
    return native.NativeFkOracle(get_robot("panda"))


def test_golden_pose_float64(panda_oracle):
    pose = panda_oracle.forward_kinematics(np.zeros((1, 7)))[0]
    golden = np.array([0.088, 0.0, 0.926, 0.0, 0.92387953, 0.38268343, 0.0])
    np.testing.assert_allclose(pose[:3], golden[:3], atol=1e-9)
    err = min(np.abs(pose[3:] - golden[3:]).max(), np.abs(pose[3:] + golden[3:]).max())
    assert err < 1e-8


@pytest.mark.parametrize("name", robot_names())
def test_oracle_matches_xla_fk(name):
    import jax.numpy as jnp

    robot = get_robot(name)
    oracle = native.NativeFkOracle(robot)
    q = np.asarray(robot.sample_joint_angles(jax.random.PRNGKey(0), 256))
    xla = np.asarray(robot.forward_kinematics(jnp.asarray(q)))
    nat = oracle.forward_kinematics(q.astype(np.float64))
    np.testing.assert_allclose(xla[:, :3], nat[:, :3], atol=5e-6)
    dq = np.minimum(
        np.abs(xla[:, 3:] - nat[:, 3:]).max(axis=1), np.abs(xla[:, 3:] + nat[:, 3:]).max(axis=1)
    )
    assert dq.max() < 5e-6


def test_oracle_jacobian_matches_xla(panda_oracle):
    import jax.numpy as jnp

    robot = get_robot("panda")
    q = np.asarray(robot.sample_joint_angles(jax.random.PRNGKey(1), 32))
    _, Jx = robot.fk_pose_and_jacobian(jnp.asarray(q))
    _, Jn = panda_oracle.fk_pose_and_jacobian(q.astype(np.float64))
    np.testing.assert_allclose(np.asarray(Jx), Jn, atol=5e-6)


def test_native_lm_converges_from_near_seeds(panda_oracle):
    robot = get_robot("panda")
    q_true = np.asarray(
        robot.sample_joint_angles(jax.random.PRNGKey(2), 200, joint_limit_eps=0.05), dtype=np.float64
    )
    targets = panda_oracle.forward_kinematics(q_true)
    q0 = q_true + 0.05 * np.random.default_rng(0).standard_normal(q_true.shape)
    qs, valid = panda_oracle.ik_lm(targets, q0, max_iters=15)
    assert valid.mean() > 0.98
    err = np.linalg.norm(panda_oracle.forward_kinematics(qs)[:, :3] - targets[:, :3], axis=1)
    assert err[valid].max() < 1e-3
    # Solutions respect joint limits.
    low = np.array([lim[0] for lim in robot.actuated_joints_limits])
    high = np.array([lim[1] for lim in robot.actuated_joints_limits])
    assert (qs >= low - 1e-9).all() and (qs <= high + 1e-9).all()


def test_native_lm_unreachable_marked_invalid(panda_oracle):
    targets = np.tile(np.array([[5.0, 5.0, 5.0, 1.0, 0, 0, 0]]), (4, 1))
    q0 = np.zeros((4, 7))
    _, valid = panda_oracle.ik_lm(targets, q0, max_iters=10)
    assert not valid.any()
