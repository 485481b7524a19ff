"""Unit tests for the quaternion/SO(3) math core."""

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.math import (
    geodesic_distance,
    quat_conjugate,
    quat_from_axis_angle,
    quat_from_matrix,
    quat_log_map,
    quat_mul,
    quat_rotate,
    quat_to_matrix,
)


def _random_unit_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_mul_conjugate_identity():
    q = _random_unit_quats(jax.random.PRNGKey(0), 64)
    ident = quat_mul(q, quat_conjugate(q))
    np.testing.assert_allclose(ident[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-5)


def test_matrix_roundtrip():
    q = _random_unit_quats(jax.random.PRNGKey(1), 256)
    q = jnp.where(q[:, :1] < 0, -q, q)
    q2 = quat_from_matrix(quat_to_matrix(q))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_rotate_matches_matrix():
    key = jax.random.PRNGKey(2)
    q = _random_unit_quats(key, 32)
    v = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    out_q = quat_rotate(q, v)
    out_m = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_m), atol=1e-5)


def test_geodesic_distance_orthogonal_is_pi():
    # Golden case from the reference: identity vs a w=0 quaternion -> pi
    # (/root/reference/tests/evaluation_utils_test.py:28-32).
    q1 = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    q2 = jnp.array([[0.0, 0.92387953, 0.38268343, 0.0]])
    d = geodesic_distance(q1, q2)
    np.testing.assert_allclose(float(d[0]), np.pi, atol=5e-4)


def test_geodesic_distance_axis_angle():
    for angle in [0.01, 0.5, 1.0, 3.0]:
        axis = jnp.array([0.0, 0.0, 1.0])
        q = quat_from_axis_angle(axis, jnp.array(angle))
        d = geodesic_distance(jnp.array([1.0, 0, 0, 0]), q)
        np.testing.assert_allclose(float(d), angle, atol=1e-3)


def test_geodesic_distance_sign_invariant():
    q = _random_unit_quats(jax.random.PRNGKey(4), 16)
    p = _random_unit_quats(jax.random.PRNGKey(5), 16)
    np.testing.assert_allclose(
        np.asarray(geodesic_distance(q, p)), np.asarray(geodesic_distance(q, -p)), atol=1e-6
    )


def test_log_map_norm_is_angle():
    axis = jnp.array([1.0, 0.0, 0.0])
    for angle in [0.0, 0.1, 1.5, 3.0]:
        q = quat_from_axis_angle(axis, jnp.array(angle))
        w = quat_log_map(q)
        np.testing.assert_allclose(float(jnp.linalg.norm(w)), angle, atol=1e-5)
