"""SO(3) / SE(3) helpers: rotation matrices from rpy and axis-angle, pure JAX.

Used by the robot layer to bake URDF joint-origin transforms into static
constants and to build per-joint rotations at trace time. TPU-native
replacement for the rotation plumbing the reference delegates to jrl/Klampt.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rpy_to_matrix_np(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """URDF rpy (extrinsic x-y-z == Rz @ Ry @ Rx) -> 3x3 rotation, host numpy.

    Host-side (numpy, float64) because joint origins are compile-time constants.
    """
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    Ry = np.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    Rx = np.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    return Rz @ Ry @ Rx


def skew_np(v: np.ndarray) -> np.ndarray:
    """Host-side skew-symmetric matrix of a 3-vector."""
    x, y, z = v
    return np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])


def axis_angle_to_matrix(K: jnp.ndarray, KK: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues with precomputed skew K and K@K constants.

    ``theta`` has shape (...,); K, KK are (3, 3) compile-time constants. Returns
    (..., 3, 3). Keeping K/KK static lets XLA fold the axis structure into the
    fused FK program instead of materializing generic cross products.
    """
    s = jnp.sin(theta)[..., None, None]
    c1 = (1.0 - jnp.cos(theta))[..., None, None]
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye + s * K + c1 * KK


def rotation_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector log map of rotation matrices (..., 3, 3) -> (..., 3).

    Stable for small angles (Taylor) and angles near pi (falls back to the
    quaternion log which is stable everywhere).
    """
    from ikflow_tpu.math.quaternion import quat_from_matrix, quat_log_map

    return quat_log_map(quat_from_matrix(R))
