"""Solution grading: pose errors, joint-limit violations, self-collisions.

TPU-native replacement for ``/root/reference/ikflow/evaluation_utils.py`` —
same result contract as ``evaluate_solutions`` (``evaluation_utils.py:130-147``)
but fully batched on device: the reference's per-config Python self-collision
loop (``evaluation_utils.py:115-126``, CPU-bound) becomes a vectorized capsule
check.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ikflow_tpu.math.quaternion import geodesic_distance


class SolutionEvaluation(NamedTuple):
    """Parity with SOLUTION_EVALUATION_RESULT_TYPE (``evaluation_utils.py:10-19``)."""

    pos_errors: jnp.ndarray  # (n,) L2 position error [m]
    rot_errors: jnp.ndarray  # (n,) geodesic rotation error [rad]
    joint_limits_exceeded: jnp.ndarray  # (n,) bool
    self_colliding: jnp.ndarray  # (n,) bool


def pose_errors(poses_1: jnp.ndarray, poses_2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L2 + angular error between pose batches (``evaluation_utils.py:37-51``)."""
    l2 = jnp.linalg.norm(poses_1[..., :3] - poses_2[..., :3], axis=-1)
    ang = geodesic_distance(poses_1[..., 3:], poses_2[..., 3:])
    return l2, ang


def pose_errors_cm_deg(poses_1: jnp.ndarray, poses_2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Errors in cm / degrees (``evaluation_utils.py:54-62``)."""
    l2, ang = pose_errors(poses_1, poses_2)
    return 100.0 * l2, jnp.rad2deg(ang)


def solution_pose_errors(robot, solutions: jnp.ndarray, target_poses: jnp.ndarray):
    """FK-grade solutions against target pose(s) (``evaluation_utils.py:65-97``).

    target_poses may be a single (7,) pose (broadcast over solutions) or (n, 7).
    """
    if target_poses.ndim == 1:
        target_poses = jnp.broadcast_to(target_poses, (solutions.shape[0], 7))
    realized = robot.forward_kinematics(solutions)
    return pose_errors(realized, target_poses)


def calculate_joint_limits_exceeded(robot, configs: jnp.ndarray) -> jnp.ndarray:
    """Per-config bool: any joint outside its limits (``evaluation_utils.py:100-112``).

    Thin delegate — the limit semantics (strict inequality) live in one place,
    ``KinematicChain.joint_limits_exceeded``."""
    return robot.joint_limits_exceeded(configs)


def calculate_self_collisions(robot, configs: jnp.ndarray) -> jnp.ndarray:
    """Vectorized self-collision flags (``evaluation_utils.py:115-126``, sans loop)."""
    return robot.config_self_collides(configs)


def solution_diversity(solutions: jnp.ndarray, n_poses: int, n_samples: int) -> jnp.ndarray:
    """Per-pose solution spread: mean pairwise joint-space L2 distance (rad).

    First-party extension beyond the reference's evaluation surface: the
    IKFlow paper's selling point is *diverse* solutions per pose, but neither
    the reference nor its scripts grade diversity. ``solutions`` is the
    ``(n_poses * n_samples, ndof)`` batch produced by evaluating
    ``n_samples`` latent draws per pose (pose-major repeat, as in
    ``evaluate --all``); returns ``(n_poses,)`` mean over the
    ``n_samples * (n_samples - 1)`` ordered pairs. A mode-collapsed model
    scores ~0 even when accurate; a healthy conditional flow spreads over the
    self-motion manifold.
    """
    assert n_samples >= 2, "diversity needs at least 2 samples per pose"
    sols = solutions.reshape(n_poses, n_samples, solutions.shape[-1])
    d = jnp.linalg.norm(sols[:, :, None, :] - sols[:, None, :, :], axis=-1)
    return jnp.sum(d, axis=(1, 2)) / (n_samples * (n_samples - 1))


def evaluate_solutions(robot, target_poses: jnp.ndarray, solutions: jnp.ndarray) -> SolutionEvaluation:
    """Full grading bundle (``evaluation_utils.py:130-147``)."""
    l2, ang = solution_pose_errors(robot, solutions, target_poses)
    return SolutionEvaluation(
        pos_errors=l2,
        rot_errors=ang,
        joint_limits_exceeded=calculate_joint_limits_exceeded(robot, solutions),
        self_colliding=calculate_self_collisions(robot, solutions),
    )
