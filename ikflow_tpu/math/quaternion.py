"""Quaternion operations in (w, x, y, z) convention, pure JAX.

TPU-native replacement for the quaternion math the reference delegates to
``jrl.math_utils`` (used at ``/root/reference/ikflow/ikflow_solver.py:6,116`` and
``/root/reference/ikflow/evaluation_utils.py``). All functions are batched over
leading axes and safe under ``jit``/``vmap``/``grad``.

Convention: quaternions are ``[w, x, y, z]`` throughout, matching the reference
(``/root/reference/README.md:76``, ``/root/reference/examples/example.py:42``).
"""

from __future__ import annotations

import jax.numpy as jnp

# Epsilon used to keep acos gradients finite near |dot| == 1.
_ACOS_EPS = 1e-7


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length. Shape (..., 4)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate [w, -x, -y, -z]. Shape (..., 4)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both (..., 4) wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4)."""
    qvec = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qvec, v)
    return v + w * t + jnp.cross(qvec, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz, w >= 0.

    Branch-free (``jnp.where``-selected) variant of Shepperd's method so it is
    batched and jit-safe; numerically stable for all trace values.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate constructions; candidate k is stable when the matching
    # diagonal-ish term is the largest.
    tw = 1.0 + m00 + m11 + m22  # 4w^2
    tx = 1.0 + m00 - m11 - m22  # 4x^2
    ty = 1.0 - m00 + m11 - m22  # 4y^2
    tz = 1.0 - m00 - m11 + m22  # 4z^2

    def _safe_sqrt(t):
        return jnp.sqrt(jnp.maximum(t, 1e-12))

    sw, sx, sy, sz = _safe_sqrt(tw), _safe_sqrt(tx), _safe_sqrt(ty), _safe_sqrt(tz)

    # q built from each of the four pivots (unnormalized).
    q_w = jnp.stack([sw * sw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * sw[..., None])
    q_x = jnp.stack([m21 - m12, sx * sx, m01 + m10, m02 + m20], axis=-1) / (2.0 * sx[..., None])
    q_y = jnp.stack([m02 - m20, m01 + m10, sy * sy, m12 + m21], axis=-1) / (2.0 * sy[..., None])
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, sz * sz], axis=-1) / (2.0 * sz[..., None])

    t_all = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(t_all, axis=-1)[..., None]
    q = jnp.where(best == 0, q_w, jnp.where(best == 1, q_x, jnp.where(best == 2, q_y, q_z)))
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0 (ties keep computed sign).
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis (..., 3, unit) + angle (...,) -> quaternion (..., 4)."""
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def geodesic_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance (radians, in [0, pi]) between unit quaternions.

    Matches the semantics of ``jrl.math_utils.geodesic_distance_between_quaternions``
    as exercised by the reference golden test
    (``/root/reference/tests/evaluation_utils_test.py:28``: orthogonal quats -> pi):
    ``2 * acos(|<q1, q2>|)`` with the dot product clamped away from +-1 so the
    gradient stays finite.
    """
    dot = jnp.sum(q1 * q2, axis=-1)
    dot = jnp.clip(jnp.abs(dot), 0.0, 1.0 - _ACOS_EPS)
    return 2.0 * jnp.arccos(dot)


def quat_log_map(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector (so(3)) log of a unit quaternion: (..., 4) -> (..., 3).

    Returns omega with ||omega|| = rotation angle in [0, pi] (sign-canonicalized
    through w >= 0). Safe at the identity (Taylor fallback).
    """
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vec = q[..., 1:]
    norm_v = jnp.linalg.norm(vec, axis=-1)
    angle = 2.0 * jnp.arctan2(norm_v, w)
    # sin(angle/2) == norm_v; scale = angle / norm_v with small-angle fallback.
    scale = jnp.where(norm_v > 1e-9, angle / jnp.maximum(norm_v, 1e-12), 2.0 / jnp.maximum(w, 1e-12))
    return vec * scale[..., None]
