"""Batched damped Levenberg-Marquardt IK refinement, fully on-device.

TPU-native replacement for ``jrl.Robot.inverse_kinematics_step_levenburg_marquardt``
(the reference's LM hot loop, ``/root/reference/ikflow/ikflow_solver.py:201-208``),
which the reference runs on *CPU* for n < 750 because its torch implementation
is launch-bound on GPU (``ikflow_solver.py:129-174``). Here the step is a single
fused XLA program: analytic FK+Jacobian rollout, 6-D pose residual, batched
(ndof x ndof) normal-equation solve — thousands of poses per launch, no host
hops, no dynamic shapes.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ikflow_tpu.math.quaternion import geodesic_distance, quat_conjugate, quat_log_map, quat_mul

# Matmul precision for the J^T J / J^T r normal-equation einsums. The r2
# precision fix pinned BOTH the FK rotation chain (robots/chain.py:148-154)
# and these einsums to "highest" to close a 935/1000 contract failure, at a
# ~10% throughput cost; this knob lets the A/B isolate whether the normal
# equations actually need it (the FK pin is not negotiable — it is what fixed
# the contract). Values: "highest" (default) | "default" | "float32".
NE_PRECISION = os.environ.get("IKFLOW_TPU_LM_NE_PRECISION", "highest")


def cholesky_solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD systems A x = b for tiny d (<= ~10), batched over the leading
    axis, with the d-loops unrolled at trace time.

    XLA's batched LU (``jnp.linalg.solve``) lowers to a generic loop-heavy
    routine that maps poorly onto the TPU vector unit for d=7..8; this unrolled
    Cholesky is straight-line elementwise code over the batch axis — every op
    is a (n,)-shaped VPU op. A: (n, d, d); b: (n, d).
    """
    d = A.shape[-1]
    # Cholesky factorization A = L L^T, L lower.
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = A[:, i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # Forward substitution L y = b.
    y = [None] * d
    for i in range(d):
        s = b[:, i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution L^T x = y.
    x = [None] * d
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def pose_residual(pose: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """6-D task-space residual [dp; omega]: dp = p_target - p, omega the
    rotation vector taking the realized orientation onto the target
    (world frame, matching the geometric Jacobian convention)."""
    dp = target[..., :3] - pose[..., :3]
    rel = quat_mul(target[..., 3:], quat_conjugate(pose[..., 3:]))
    omega = quat_log_map(rel)
    return jnp.concatenate([dp, omega], axis=-1)


def lm_step(
    robot,
    q: jnp.ndarray,
    target_poses: jnp.ndarray,
    lambd: float = 1e-4,
    clamp_to_limits: bool = True,
) -> jnp.ndarray:
    """One damped LM (Gauss-Newton + Tikhonov) step for every pose in the batch.

    Solves (J^T J + lambd * I) dq = J^T r per pose and returns q + dq, optionally
    clamped into joint limits. q: (n, ndof), target_poses: (n, 7).
    """
    pose, J = robot.fk_pose_and_jacobian(q)  # (n,7), (n,6,ndof)
    r = pose_residual(pose, target_poses)  # (n,6)
    ndof = q.shape[-1]
    JtJ = jnp.einsum("nij,nik->njk", J, J, precision=NE_PRECISION) + lambd * jnp.eye(ndof, dtype=q.dtype)
    Jtr = jnp.einsum("nij,ni->nj", J, r, precision=NE_PRECISION)
    dq = cholesky_solve_small(JtJ, Jtr)
    q_new = q + dq
    if clamp_to_limits:
        q_new = jnp.clip(q_new, robot.limits_low(q.dtype), robot.limits_high(q.dtype))
    return q_new


def config_pose_errors(robot, q: jnp.ndarray, target_poses: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(positional L2 error, quaternion-geodesic rotational error) per config.
    Parity: ``IKFlowSolver._calculate_pose_error`` (``ikflow_solver.py:112-117``).

    Delegates to ``evaluation.solution_pose_errors`` so the grading semantics
    live in one place; named distinctly from ``evaluation.pose_errors`` (which
    compares two pose arrays, no FK) to avoid wrong-import bugs."""
    from ikflow_tpu.evaluation import solution_pose_errors

    return solution_pose_errors(robot, q, target_poses)


def refine(
    robot,
    q0: jnp.ndarray,
    target_poses: jnp.ndarray,
    n_steps: int,
    pos_tol: float,
    rot_tol: float,
    lambd: float = 1e-4,
    clamp_to_limits: bool = True,
    lambd_min: float = 1e-8,
    lambd_max: float = 1e3,
    lambd_down: float = 0.333,
    lambd_up: float = 5.0,
    restart_key: jax.Array | None = None,
    restart_lambd: float = 3.0,
):
    """Adaptive-damping LM with first-valid-wins capture, fixed shapes.

    This replaces the reference's dynamic-shape convergence loop
    (``ikflow_solver.py:201-233``): instead of shrinking the batch to
    still-invalid poses, every pose runs all steps and a mask freezes the first
    valid solution (matching the reference's scatter at
    ``ikflow_solver.py:217-225``). On top of the reference semantics this uses
    classic per-pose adaptive damping (accept/reject trust-region control),
    which converges from cold random seeds — the reference leans on a trained
    flow for good seeds and a fixed small damping.

    Validity is read directly off the task residual: ``||r[3:]||`` is exactly
    the geodesic rotation angle (quaternion log map), so no extra FK pass is
    needed per check.

    With ``restart_key`` set, a pose whose damping climbs to
    ``restart_lambd`` (default 3.0) on a REJECTED step while still invalid
    gets a fresh uniform random seed, turning the fixed-shape loop into a
    self-restarting solver. The restart fires deliberately early — far below
    ``lambd_max``: from ``lambd=1e-4``, reaching 3.0 means ~7 consecutive
    rejected steps (x5.0 each), and with a 3-step production budget only
    already-hopeless basins (seeds whose solution manifold lies outside the
    joint limits) ever climb that far; waiting for ``lambd_max`` (1e3, ~4
    more rejections) would just burn the remaining budget in a basin that
    cannot converge. The threshold is measured behavior, asserted by
    ``tests/test_lm.py::test_restart_fires_at_restart_lambd``.

    Returns (captured_q, captured_valid, q_final).
    """
    n, ndof = q0.shape
    eye = jnp.eye(ndof, dtype=q0.dtype)
    low = robot.limits_low(q0.dtype)
    high = robot.limits_high(q0.dtype)

    def errs_of(q):
        pose = robot.forward_kinematics(q)
        r = pose_residual(pose, target_poses)
        return r, jnp.sum(r * r, axis=-1)

    def body(carry, step_key):
        q, lam, cap_q, cap_valid = carry
        pose, J = robot.fk_pose_and_jacobian(q)
        r = pose_residual(pose, target_poses)
        # Capture current q if already within tolerance.
        pos_err = jnp.linalg.norm(r[:, :3], axis=-1)
        rot_err = jnp.linalg.norm(r[:, 3:], axis=-1)
        valid = (pos_err < pos_tol) & (rot_err < rot_tol)
        newly = valid & jnp.logical_not(cap_valid)
        cap_q = jnp.where(newly[:, None], q, cap_q)
        cap_valid = cap_valid | valid

        err = jnp.sum(r * r, axis=-1)
        JtJ = jnp.einsum("nij,nik->njk", J, J, precision=NE_PRECISION) + lam[:, None, None] * eye
        Jtr = jnp.einsum("nij,ni->nj", J, r, precision=NE_PRECISION)
        if clamp_to_limits:
            # Bound-constrained step (projected active set): a DOF pinned at a
            # limit whose descent direction points outward is frozen out of the
            # normal equations this iteration, so the solve redistributes the
            # motion to free DOFs instead of deadlocking against the clamp.
            pinned_out = ((q <= low + 1e-6) & (Jtr < 0)) | ((q >= high - 1e-6) & (Jtr > 0))
            free = jnp.logical_not(pinned_out).astype(q.dtype)  # (n, ndof)
            mask2d = free[:, :, None] * free[:, None, :]
            JtJ = JtJ * mask2d + (1.0 - free)[:, :, None] * eye
            Jtr = Jtr * free
        dq = cholesky_solve_small(JtJ, Jtr)
        q_try = q + dq
        if clamp_to_limits:
            q_try = jnp.clip(q_try, low, high)
        _, err_try = errs_of(q_try)
        improved = err_try < err
        q_next = jnp.where(improved[:, None], q_try, q)
        lam_next = jnp.where(improved, jnp.maximum(lam * lambd_down, lambd_min),
                             jnp.minimum(lam * lambd_up, lambd_max))
        if step_key is not None:
            # lam climbing past ~restart_lambd means steps have shrunk to
            # nothing without reaching tolerance — a dead basin. Redraw.
            stuck = (lam_next >= restart_lambd) & jnp.logical_not(cap_valid) & jnp.logical_not(improved)
            fresh = jax.random.uniform(step_key, q.shape, q.dtype) * (high - low) + low
            q_next = jnp.where(stuck[:, None], fresh, q_next)
            lam_next = jnp.where(stuck, jnp.full_like(lam_next, lambd), lam_next)
        return (q_next, lam_next, cap_q, cap_valid), None

    lam0 = jnp.full((n,), lambd, dtype=q0.dtype)
    init = (q0, lam0, q0, jnp.zeros(n, dtype=bool))
    xs = jax.random.split(restart_key, n_steps) if restart_key is not None else None
    (q, _, cap_q, cap_valid), _ = jax.lax.scan(body, init, xs, length=n_steps)

    # Final state may have newly converged on the last step — one last check.
    r, _ = errs_of(q)
    pos_err = jnp.linalg.norm(r[:, :3], axis=-1)
    rot_err = jnp.linalg.norm(r[:, 3:], axis=-1)
    valid = (pos_err < pos_tol) & (rot_err < rot_tol)
    newly = valid & jnp.logical_not(cap_valid)
    cap_q = jnp.where(newly[:, None], q, cap_q)
    cap_valid = cap_valid | valid
    return cap_q, cap_valid, q
