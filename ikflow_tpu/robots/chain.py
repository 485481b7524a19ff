"""Declarative kinematic chains with batched XLA forward kinematics.

TPU-native replacement for the reference's robot layer, which lives in the
external ``jrl`` package (``Robot.forward_kinematics``,
``Robot.sample_joint_angles_and_poses``, ``Robot.clamp_to_joint_limits``,
``Robot.config_self_collides`` — usage at
``/root/reference/ikflow/ikflow_solver.py:114,205``,
``/root/reference/ikflow/evaluation_utils.py:86,125``,
``/root/reference/scripts/build_dataset.py:90``).

Design (TPU-first, not a port):
- A robot is a *static* chain spec: per-joint origin transforms, axes, types and
  limits baked as host numpy constants. FK is a fixed unrolled composition of
  (R, p) pairs under ``jit``/``vmap`` — XLA folds the constant origins into the
  fused program, so the whole chain compiles to a short sequence of batched
  elementwise ops + small matmuls over the batch axis (the only large axis).
- The geometric Jacobian is analytic (z_i x (p_ee - p_i) for revolute joints),
  computed from the same FK rollout — no autodiff tracing of the chain and no
  Python-level dynamic control flow.
- Everything is batched over a leading batch axis; there are no per-config
  Python loops anywhere (contrast ``/root/reference/ikflow/evaluation_utils.py:125``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.math.quaternion import quat_from_matrix
from ikflow_tpu.math.so3 import rpy_to_matrix_np, skew_np

REVOLUTE = "revolute"
PRISMATIC = "prismatic"
FIXED = "fixed"


@dataclasses.dataclass(frozen=True)
class Joint:
    """One joint in a serial chain, URDF-style.

    ``xyz``/``rpy`` give the constant transform from the parent link frame to
    this joint's frame; ``axis`` is the motion axis in the joint frame.
    """

    name: str
    xyz: Tuple[float, float, float]
    rpy: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    axis: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    joint_type: str = REVOLUTE
    limits: Optional[Tuple[float, float]] = None

    def __post_init__(self):
        assert self.joint_type in (REVOLUTE, PRISMATIC, FIXED), self.joint_type
        if self.joint_type != FIXED:
            assert self.limits is not None, f"actuated joint {self.name} needs limits"


@dataclasses.dataclass(frozen=True)
class Capsule:
    """Collision capsule attached to link frame ``frame_index`` (0 = base,
    i = frame after joint i). Endpoints are in that link's local frame."""

    frame_index: int
    p0: Tuple[float, float, float]
    p1: Tuple[float, float, float]
    radius: float


class KinematicChain:
    """A serial kinematic chain with compiled batched FK / Jacobian / sampling.

    All heavy methods are jit-compiled lazily and cached on the instance. The
    chain data itself is host numpy — it is a compile-time constant of every
    kernel, never a runtime input (static shapes, no HBM traffic for it).
    """

    def __init__(
        self,
        name: str,
        joints: Sequence[Joint],
        capsules: Sequence[Capsule] = (),
        collision_ignore_pairs: Sequence[Tuple[int, int]] = (),
        calibration_configs: Optional[Sequence[Sequence[float]]] = None,
        dtype=jnp.float32,
    ):
        self.name = name
        self.joints = tuple(joints)
        self.dtype = dtype

        actuated = [j for j in self.joints if j.joint_type != FIXED]
        self._ndof = len(actuated)
        self.actuated_joint_names = tuple(j.name for j in actuated)
        self.actuated_joints_limits: Tuple[Tuple[float, float], ...] = tuple(
            j.limits for j in actuated
        )
        lows = np.array([lim[0] for lim in self.actuated_joints_limits], dtype=np.float64)
        highs = np.array([lim[1] for lim in self.actuated_joints_limits], dtype=np.float64)
        self._limits_low = lows
        self._limits_high = highs

        # Precompute per-joint constants (host, float64 -> cast at trace time).
        self._origins_R = [rpy_to_matrix_np(*j.rpy) for j in self.joints]
        self._origins_t = [np.asarray(j.xyz, dtype=np.float64) for j in self.joints]
        self._axes = [np.asarray(j.axis, dtype=np.float64) for j in self.joints]
        self._K = [skew_np(a) for a in self._axes]
        self._KK = [K @ K for K in self._K]

        # Collision model.
        self.capsules = tuple(capsules)
        self._calibration_configs = (
            None if calibration_configs is None
            else [np.asarray(c, dtype=np.float64) for c in calibration_configs]
        )
        self._collision_pairs = self._build_collision_pairs(collision_ignore_pairs)

        self._jit_cache = {}

    # ------------------------------------------------------------------
    # Properties mirroring the reference robot API (jrl.robots.Robot).
    # ------------------------------------------------------------------
    @property
    def ndof(self) -> int:
        return self._ndof

    @property
    def n_capsule_pairs(self) -> int:
        return len(self._collision_pairs)

    def limits_low(self, dtype=None) -> jnp.ndarray:
        return jnp.asarray(self._limits_low, dtype=dtype or self.dtype)

    def limits_high(self, dtype=None) -> jnp.ndarray:
        return jnp.asarray(self._limits_high, dtype=dtype or self.dtype)

    # ------------------------------------------------------------------
    # Core rollout (trace-time unrolled; called inside jit only).
    # ------------------------------------------------------------------
    def _rollout(self, q: jnp.ndarray):
        """Compose the chain. q: (..., ndof). Returns:
        frames: list of (R (...,3,3), p (...,3)) — one per joint (post-joint),
        world_axes: list (...,3) per actuated joint,
        world_origins: list (...,3) per actuated joint.
        """
        assert q.shape[-1] == self._ndof, (
            f"{self.name}: q last dim must be ndof={self._ndof}, got shape {q.shape}"
        )
        dtype = q.dtype
        # Full-precision rotation algebra: TPU matmuls default to bf16 MXU
        # passes, and bf16-truncating a chain of 8+ composed 3x3 rotations
        # costs ~0.5 mm / ~0.3 deg of FK noise — most of the exact-IK
        # tolerance budget (1 mm / 0.572 deg). These matrices are tiny, so
        # "highest" costs nothing measurable.
        mm = lambda a, b: jnp.matmul(a, b, precision="highest")  # noqa: E731
        rot = lambda Rm, v: jnp.einsum("...ij,j->...i", Rm, v, precision="highest")  # noqa: E731
        batch_shape = q.shape[:-1]
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        p = jnp.zeros(batch_shape + (3,), dtype=dtype)
        frames = []
        world_axes = []
        world_origins = []
        qi = 0
        for idx, joint in enumerate(self.joints):
            Ro = jnp.asarray(self._origins_R[idx], dtype=dtype)
            to = jnp.asarray(self._origins_t[idx], dtype=dtype)
            p = p + rot(R, to)
            R = mm(R, Ro)
            if joint.joint_type == REVOLUTE:
                theta = q[..., qi]
                axis = jnp.asarray(self._axes[idx], dtype=dtype)
                world_axes.append(rot(R, axis))
                world_origins.append(p)
                K = jnp.asarray(self._K[idx], dtype=dtype)
                KK = jnp.asarray(self._KK[idx], dtype=dtype)
                s = jnp.sin(theta)[..., None, None]
                c1 = (1.0 - jnp.cos(theta))[..., None, None]
                Rj = jnp.eye(3, dtype=dtype) + s * K + c1 * KK
                R = mm(R, Rj)
                qi += 1
            elif joint.joint_type == PRISMATIC:
                d = q[..., qi]
                axis = jnp.asarray(self._axes[idx], dtype=dtype)
                world_axis = rot(R, axis)
                world_axes.append(world_axis)
                world_origins.append(p)
                p = p + d[..., None] * world_axis
                qi += 1
            # FIXED: origin transform only.
            frames.append((R, p))
        assert qi == self._ndof
        return frames, world_axes, world_origins

    # ------------------------------------------------------------------
    # Public compiled ops.
    # ------------------------------------------------------------------
    def forward_kinematics(self, q: jnp.ndarray) -> jnp.ndarray:
        """Batched FK: q (..., ndof) -> pose (..., 7) as [x,y,z,qw,qx,qy,qz].

        Parity with ``jrl.robots.Robot.forward_kinematics`` as pinned by the
        reference golden test (``/root/reference/tests/evaluation_utils_test.py:20-24``).
        """
        return self._get_jitted("fk")(q)

    def fk_pose_and_jacobian(self, q: jnp.ndarray):
        """Returns (pose (...,7), J (...,6,ndof)) with J = [J_pos; J_rot].

        The analytic geometric Jacobian of the end-effector: for revolute
        joint i, J_pos[:, i] = z_i x (p_ee - p_i), J_rot[:, i] = z_i; for
        prismatic, J_pos[:, i] = z_i, J_rot[:, i] = 0. This is the TPU
        replacement for jrl's Jacobian used inside
        ``inverse_kinematics_step_levenburg_marquardt``
        (``/root/reference/ikflow/ikflow_solver.py:205-208``).
        """
        return self._get_jitted("fk_jac")(q)

    def fk_frames(self, q: jnp.ndarray):
        """All link frames: q (..., ndof) -> (R (..., L, 3, 3), p (..., L, 3))."""
        return self._get_jitted("fk_frames")(q)

    def clamp_to_joint_limits(self, q: jnp.ndarray) -> jnp.ndarray:
        """Elementwise clamp to the actuated joint limits."""
        return self._get_jitted("clamp")(q)

    def joint_limits_exceeded(self, q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
        """(..., ndof) -> (...,) bool: any joint outside [low - eps, high + eps].

        Parity: ``/root/reference/ikflow/evaluation_utils.py:100-112`` (strict
        inequality: a config exactly at the limit is not 'exceeded')."""
        low = self.limits_low(q.dtype) - eps
        high = self.limits_high(q.dtype) + eps
        return jnp.any((q < low) | (q > high), axis=-1)

    def sample_joint_angles(self, key: jax.Array, n: int, joint_limit_eps: float = 0.0) -> jnp.ndarray:
        """Uniform samples within [low + eps, high - eps]. Device-side RNG.

        Replaces jrl's host-side sampling used by
        ``/root/reference/scripts/build_dataset.py:90`` — runs on TPU.
        """
        max_eps = 0.5 * float((self._limits_high - self._limits_low).min())
        assert 0.0 <= joint_limit_eps < max_eps, (
            f"joint_limit_eps={joint_limit_eps} must be in [0, {max_eps:.4f}) for {self.name} "
            "(half the narrowest joint range), else the sampling range inverts"
        )
        low = self.limits_low() + joint_limit_eps
        high = self.limits_high() - joint_limit_eps
        u = jax.random.uniform(key, (n, self._ndof), dtype=self.dtype)
        return low + u * (high - low)

    def config_self_collides(self, q: jnp.ndarray) -> jnp.ndarray:
        """(..., ndof) -> (...,) bool. Vectorized capsule-capsule distance over a
        static pair list — no per-config Python loop (contrast the reference's
        CPU-bound loop at ``/root/reference/ikflow/evaluation_utils.py:115-126``).

        Capsule geometry is first-party (authored in ``robots/library.py``); radii
        are approximations of the jrl capsule set, so absolute collision rates may
        differ slightly from the reference while the filtering behavior matches.
        """
        if not self.capsules or not self._collision_pairs:
            return jnp.zeros(q.shape[:-1], dtype=bool)
        return self._get_jitted("self_collides")(q)

    def sample_joint_angles_and_poses(
        self,
        key: jax.Array,
        n: int,
        joint_limit_eps: float = 0.0,
        only_non_self_colliding: bool = False,
        oversample_factor: int = 2,
    ):
        """Sample (q, pose) pairs on device; optionally filter self-collisions.

        Fixed-shape filtering: oversample by ``oversample_factor``, then take the
        first ``n`` non-colliding rows via a stable argsort on the collision mask.
        Raises if the oversampled batch has fewer than ``n`` collision-free rows
        (increase ``oversample_factor`` — typical collision rates are a few %).
        Parity target: ``robot.sample_joint_angles_and_poses`` in
        ``/root/reference/scripts/build_dataset.py:90-101``.
        """
        if not only_non_self_colliding:
            q = self.sample_joint_angles(key, n, joint_limit_eps)
            return q, self.forward_kinematics(q)
        m = n * oversample_factor
        q = self.sample_joint_angles(key, m, joint_limit_eps)
        colliding = self.config_self_collides(q)
        n_clean = int(m - jnp.sum(colliding))
        if n_clean < n:
            raise ValueError(
                f"only {n_clean}/{m} oversampled configs are collision-free (need {n}); "
                f"raise oversample_factor (currently {oversample_factor})"
            )
        order = jnp.argsort(colliding, stable=True)  # non-colliding (False) first
        q = q[order[:n]]
        return q, self.forward_kinematics(q)

    # ------------------------------------------------------------------
    # Internals.
    # ------------------------------------------------------------------
    def _fk_frames_np(self, q: np.ndarray):
        """Host (numpy, float64) FK frames for construction-time calibration.

        Mirrors ``_rollout`` without touching a device — chain construction must
        not trigger TPU compilation.
        """
        R = np.eye(3)
        p = np.zeros(3)
        frames = []
        qi = 0
        for idx, joint in enumerate(self.joints):
            p = p + R @ self._origins_t[idx]
            R = R @ self._origins_R[idx]
            if joint.joint_type == REVOLUTE:
                K, KK = self._K[idx], self._KK[idx]
                th = q[qi]
                R = R @ (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * KK)
                qi += 1
            elif joint.joint_type == PRISMATIC:
                p = p + q[qi] * (R @ self._axes[idx])
                qi += 1
            frames.append((R.copy(), p.copy()))
        return frames

    def _capsule_endpoints_np(self, q: np.ndarray):
        frames = self._fk_frames_np(q)
        pts = []
        for cap in self.capsules:
            if cap.frame_index == 0:
                R, p = np.eye(3), np.zeros(3)
            else:
                R, p = frames[cap.frame_index - 1]
            pts.append((p + R @ np.asarray(cap.p0), p + R @ np.asarray(cap.p1)))
        return pts

    @staticmethod
    def _seg_seg_distance_np(p0, p1, q0, q1) -> float:
        # Cheap dense sampling is fine host-side at construction time.
        ts = np.linspace(0.0, 1.0, 24)
        a = p0[None, :] + ts[:, None] * (p1 - p0)[None, :]
        b = q0[None, :] + ts[:, None] * (q1 - q0)[None, :]
        d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        return float(d.min())

    def _build_collision_pairs(self, ignore: Sequence[Tuple[int, int]], margin: float = 0.02):
        """Collision-checkable capsule pairs: all pairs minus (a) explicit
        ignores and (b) pairs that come within ``rsum + margin`` at any of a
        small set of known-valid reference configurations (mid-limits center
        and the straightened clamped-zero pose).

        (b) is a self-calibrating allowed-collision matrix: capsules that touch
        in a nominal valid pose are structurally adjacent (chained skeleton
        segments, permanent near-contacts) and can never signal a *meaningful*
        self-collision, while genuinely articulable pairs (hand vs base, wrist
        vs upper arm) are far apart in those poses and stay in the list. Same
        role as the curated capsule-pair list jrl ships per robot.

        The calibration configs MUST be collision-free poses of the real
        robot: a config where two far links genuinely touch (e.g. Panda at
        q=0, hand folded onto the forearm) would silently whitelist that
        pair. Robots whose clamped-zero pose is not valid pass explicit
        ``calibration_configs`` (e.g. the Franka "ready" pose).
        """
        if not self.capsules:
            return tuple()
        ignore_set = {tuple(sorted(p)) for p in ignore}
        ref_configs = self._calibration_configs or [
            0.5 * (self._limits_low + self._limits_high),
            np.clip(np.zeros(self._ndof), self._limits_low, self._limits_high),
        ]
        ref_pts = [self._capsule_endpoints_np(qc) for qc in ref_configs]
        pairs = []
        for a in range(len(self.capsules)):
            for b in range(a + 1, len(self.capsules)):
                if tuple(sorted((a, b))) in ignore_set:
                    continue
                if abs(self.capsules[a].frame_index - self.capsules[b].frame_index) <= 1:
                    continue
                rsum = self.capsules[a].radius + self.capsules[b].radius
                d = min(
                    self._seg_seg_distance_np(pts[a][0], pts[a][1], pts[b][0], pts[b][1])
                    for pts in ref_pts
                )
                if d < rsum + margin:
                    continue
                pairs.append((a, b))
        return tuple(pairs)

    def _fk_impl(self, q):
        frames, _, _ = self._rollout(q)
        R, p = frames[-1]
        return jnp.concatenate([p, quat_from_matrix(R)], axis=-1)

    def _fk_jac_impl(self, q):
        frames, world_axes, world_origins = self._rollout(q)
        R, p_ee = frames[-1]
        pose = jnp.concatenate([p_ee, quat_from_matrix(R)], axis=-1)
        cols_pos, cols_rot = [], []
        ai = 0
        for joint in self.joints:
            if joint.joint_type == FIXED:
                continue
            z = world_axes[ai]
            o = world_origins[ai]
            if joint.joint_type == REVOLUTE:
                cols_pos.append(jnp.cross(z, p_ee - o))
                cols_rot.append(z)
            else:  # prismatic
                cols_pos.append(z)
                cols_rot.append(jnp.zeros_like(z))
            ai += 1
        J_pos = jnp.stack(cols_pos, axis=-1)  # (..., 3, ndof)
        J_rot = jnp.stack(cols_rot, axis=-1)
        return pose, jnp.concatenate([J_pos, J_rot], axis=-2)

    def _fk_frames_impl(self, q):
        frames, _, _ = self._rollout(q)
        Rs = jnp.stack([f[0] for f in frames], axis=-3)
        ps = jnp.stack([f[1] for f in frames], axis=-2)
        return Rs, ps

    def _self_collides_impl(self, q):
        Rs, ps = self._fk_frames_impl(q)  # (..., L, 3, 3), (..., L, 3)
        dtype = q.dtype
        # World-space capsule endpoints, stacked (..., C, 3).
        a0s, a1s = [], []
        for cap in self.capsules:
            fi = cap.frame_index
            if fi == 0:
                R = jnp.eye(3, dtype=dtype)
                p = jnp.zeros(q.shape[:-1] + (3,), dtype=dtype)
                a0 = p + jnp.asarray(cap.p0, dtype=dtype)
                a1 = p + jnp.asarray(cap.p1, dtype=dtype)
            else:
                R = Rs[..., fi - 1, :, :]
                p = ps[..., fi - 1, :]
                a0 = p + jnp.einsum("...ij,j->...i", R, jnp.asarray(cap.p0, dtype=dtype))
                a1 = p + jnp.einsum("...ij,j->...i", R, jnp.asarray(cap.p1, dtype=dtype))
            a0s.append(a0)
            a1s.append(a1)
        A0 = jnp.stack(a0s, axis=-2)
        A1 = jnp.stack(a1s, axis=-2)
        ia = np.array([p[0] for p in self._collision_pairs])
        ib = np.array([p[1] for p in self._collision_pairs])
        radii = np.array([c.radius for c in self.capsules])
        rsum = jnp.asarray(radii[ia] + radii[ib], dtype=dtype)
        d = _segment_segment_distance(
            A0[..., ia, :], A1[..., ia, :], A0[..., ib, :], A1[..., ib, :]
        )  # (..., P)
        return jnp.any(d < rsum, axis=-1)

    def _get_jitted(self, which: str):
        fn = self._jit_cache.get(which)
        if fn is None:
            impl = {
                "fk": self._fk_impl,
                "fk_jac": self._fk_jac_impl,
                "fk_frames": self._fk_frames_impl,
                "self_collides": self._self_collides_impl,
                "clamp": lambda q: jnp.clip(q, self.limits_low(q.dtype), self.limits_high(q.dtype)),
            }[which]
            fn = jax.jit(impl)
            self._jit_cache[which] = fn
        return fn

    def __repr__(self):
        return f"KinematicChain(name={self.name!r}, ndof={self.ndof})"


def _segment_segment_distance(p0, p1, q0, q1):
    """Minimum distance between segments [p0,p1] and [q0,q1], batched (..., 3).

    Standard clamped closest-point parameterization (Ericson, Real-Time
    Collision Detection §5.1.9), fully vectorized and branch-free.
    """
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    # Parallel / degenerate guards via epsilon + final clamping.
    s = jnp.where(denom > 1e-12, (b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > 1e-12, (b * s + f) / jnp.maximum(e, 1e-12), 0.0)
    # Re-clamp s for the clamped t (standard second pass).
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        (t != t_cl) | (e <= 1e-12),
        jnp.clip(jnp.where(a > 1e-12, (t_cl * b - c) / jnp.maximum(a, 1e-12), 0.0), 0.0, 1.0),
        s,
    )
    t = t_cl
    cp = p0 + s[..., None] * d1
    cq = q0 + t[..., None] * d2
    return jnp.linalg.norm(cp - cq, axis=-1)
