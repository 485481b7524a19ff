"""Flow-core tests: invertibility, logdet correctness vs autodiff, head
semantics (joint-limit mapping exactness), permutation reproducibility.

Mirrors the reference's model tests (``/root/reference/tests/model_test.py``)
plus the invertibility/logdet contracts the reference lacks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.flow import FlowHyperParams, GlowFlow, build_flow, tiny_model_params
from ikflow_tpu.robots import get_robot


def _tiny_flow(sigmoid=False, softflow=True, D=9):
    hp = tiny_model_params()
    hp.dim_latent_space = D
    hp.sigmoid_on_output = sigmoid
    hp.softflow_enabled = softflow and not sigmoid
    robot = get_robot("panda")
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    return flow, params, robot


def _sample_q_padded(robot, flow, key, n):
    kq, kp = jax.random.split(key)
    q = robot.sample_joint_angles(kq, n, joint_limit_eps=0.01)
    pad = 0.1 * jax.random.normal(kp, (n, flow.D - robot.ndof))
    return jnp.concatenate([q, pad], axis=1)


def _cond(flow, poses, n):
    c = jnp.concatenate([poses, jnp.zeros((n, flow.dim_cond - 7))], axis=1)
    return c


@pytest.mark.parametrize("sigmoid", [False, True])
def test_forward_inverse_roundtrip(sigmoid):
    flow, params, robot = _tiny_flow(sigmoid=sigmoid)
    n = 64
    x = _sample_q_padded(robot, flow, jax.random.PRNGKey(1), n)
    if sigmoid:
        # pads must be inside (-1, 1) for the pre-sigmoid scaling.
        x = x.at[:, robot.ndof :].set(jnp.clip(x[:, robot.ndof :], -0.9, 0.9))
    poses = robot.forward_kinematics(x[:, : robot.ndof])
    cond = _cond(flow, poses, n)
    z, ld_f = flow.forward(params, x, cond)
    x2, ld_i = flow.inverse(params, z, cond)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-4)
    # logdets of inverse directions must cancel.
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=2e-3)


def test_logdet_matches_autodiff_jacobian():
    """Total logdet must equal log|det(dz/dx)| computed by autodiff."""
    flow, params, robot = _tiny_flow(sigmoid=False, D=8)
    n = 4
    x = _sample_q_padded(robot, flow, jax.random.PRNGKey(2), n)
    poses = robot.forward_kinematics(x[:, : robot.ndof])
    cond = _cond(flow, poses, n)

    _, ld = flow.forward(params, x, cond)

    def single(xi, ci):
        z, _ = flow.forward(params, xi[None], ci[None])
        return z[0]

    for i in range(n):
        J = jax.jacfwd(single)(x[i], cond[i])
        sign, logdet_ad = np.linalg.slogdet(np.asarray(J, dtype=np.float64))
        assert sign > 0 or abs(float(ld[i])) > 0  # flow should be orientation-consistent per-sample
        np.testing.assert_allclose(float(ld[i]), float(logdet_ad), atol=5e-3)


def test_latent_is_sensitive_to_condition():
    flow, params, robot = _tiny_flow()
    n = 8
    x = _sample_q_padded(robot, flow, jax.random.PRNGKey(3), n)
    poses = robot.forward_kinematics(x[:, : robot.ndof])
    c1 = _cond(flow, poses, n)
    c2 = c1.at[:, 0].add(0.3)
    z1, _ = flow.forward(params, x, c1)
    z2, _ = flow.forward(params, x, c2)
    assert float(jnp.abs(z1 - z2).max()) > 1e-3


def test_inverse_deterministic_and_pose_sensitive():
    """Same (latent, cond) -> same q; different cond -> different q.
    Mirrors /root/reference/tests/ikflow_solver_test.py:89-117."""
    flow, params, robot = _tiny_flow()
    n = 16
    z = jax.random.normal(jax.random.PRNGKey(4), (n, flow.D))
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(5), n))
    cond = _cond(flow, poses, n)
    q1, _ = flow.inverse(params, z, cond)
    q2, _ = flow.inverse(params, z, cond)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    poses_b = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(6), n))
    q3, _ = flow.inverse(params, z, _cond(flow, poses_b, n))
    assert float(jnp.abs(q1 - q3).max()) > 1e-3


def test_sigmoid_head_hard_bounds_joint_limits():
    """Even huge latents must land inside joint limits with the sigmoid head.
    Mirrors /root/reference/tests/model_test.py:108-123."""
    flow, params, robot = _tiny_flow(sigmoid=True, softflow=False)
    n = 32
    z = 1e8 * jax.random.normal(jax.random.PRNGKey(7), (n, flow.D))
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(8), n))
    q, _ = flow.inverse(params, z, _cond(flow, poses, n))
    low = np.asarray(robot.limits_low())
    high = np.asarray(robot.limits_high())
    qj = np.asarray(q[:, : robot.ndof])
    assert (qj >= low - 1e-5).all() and (qj <= high + 1e-5).all()


def test_pre_sigmoid_scaling_maps_limits_to_unit_interval():
    """Joint limits map exactly to [0, 1] (and back).
    Mirrors /root/reference/tests/model_test.py:50-106."""
    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 9
    hp.sigmoid_on_output = True
    hp.softflow_enabled = False
    flow = build_flow(hp, robot)
    low = np.array([lim[0] for lim in robot.actuated_joints_limits])
    high = np.array([lim[1] for lim in robot.actuated_joints_limits])
    for vals, target in [(low, 0.0), (high, 1.0)]:
        x = np.zeros(flow.D)
        x[: robot.ndof] = vals
        scaled = x * flow._head_scale + flow._head_offset
        np.testing.assert_allclose(scaled[: robot.ndof], target, atol=1e-9)
    # Pads: +-SIGMOID_SCALING_ABS_MAX -> 0/1.
    x = np.zeros(flow.D)
    x[robot.ndof :] = 1.0
    scaled = x * flow._head_scale + flow._head_offset
    np.testing.assert_allclose(scaled[robot.ndof :], 1.0, atol=1e-9)


def test_permutations_match_freia_seeding():
    """Per-block permutation i must equal np.random.RandomState(i).permutation(D)
    (Fm.PermuteRandom semantics, /root/reference/ikflow/model.py:339)."""
    flow, _, _ = _tiny_flow()
    for i, p in enumerate(flow._perms):
        np.testing.assert_array_equal(p, np.random.RandomState(i).permutation(flow.D))


def test_grad_step_changes_output():
    """One SGD step on the NLL changes the forward output — gradient plumbing.
    Mirrors /root/reference/tests/lt_model_test.py:25-44."""
    flow, params, robot = _tiny_flow()
    n = 32
    x = _sample_q_padded(robot, flow, jax.random.PRNGKey(9), n)
    poses = robot.forward_kinematics(x[:, : robot.ndof])
    cond = _cond(flow, poses, n)

    def loss_fn(p):
        z, ld = flow.forward(p, x, cond)
        return jnp.mean(0.5 * jnp.sum(z**2, axis=1) - ld)

    g = jax.grad(loss_fn)(params)
    new_params = jax.tree_util.tree_map(lambda p, gi: p - 1e-3 * gi, params, g)
    z0, _ = flow.forward(params, x, cond)
    z1, _ = flow.forward(new_params, x, cond)
    assert float(jnp.abs(z0 - z1).max()) > 1e-6
    # And the loss went down for this batch.
    assert float(loss_fn(new_params)) < float(loss_fn(params))


def test_default_hyperparams_match_reference():
    hp = FlowHyperParams()
    assert hp.nb_nodes == 12
    assert hp.dim_latent_space == 9
    assert hp.coeff_fn_config == 3
    assert hp.coeff_fn_internal_size == 1024
    assert hp.rnvp_clamp == 2.5
    assert hp.softflow_enabled and hp.softflow_noise_scale == 0.01
    assert not hp.sigmoid_on_output


def test_param_count_scales():
    flow, params, _ = _tiny_flow()
    n = flow.n_params(params)
    # tiny: 3 blocks x 2 subnets x (in*256 + 256*256 + 256*out + biases)
    assert 3 * 2 * 256 * 256 < n < 3 * 2 * 3 * 256 * 256
