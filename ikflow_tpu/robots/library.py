"""First-party robot definitions: Panda, Fetch, FetchArm, Rizon4.

The reference gets these from the external ``jrl`` package (pinned git commit,
``/root/reference/pyproject.toml:22``); here the kinematic data is authored
directly from the public URDFs so the whole robot layer is self-contained and
compile-time constant.

Verification status:
- **Panda**: exact — the zero-config FK pose reproduces the reference golden
  value ``[0.088, 0, 0.926, 0, 0.92387953, 0.38268343, 0]``
  (``/root/reference/tests/evaluation_utils_test.py:21-24``). End-effector frame
  is ``panda_hand`` (flange + 0.107 m, -45 deg twist).
- **Fetch / FetchArm**: authored from ``fetch_description`` URDF values;
  continuous joints are bounded to [-pi, pi] for sampling/normalization
  (the flow normalizes joints by their limit magnitude, so finite bounds are
  required — see ``/root/reference/ikflow/model.py:310-316``). FetchArm is the
  Fetch chain with the torso lift fixed at zero extension.
- **Rizon4**: approximate. Exact parity would require the Flexiv ``rizon4``
  URDF joint frames that jrl pins; this build environment has no network
  egress and does not bundle jrl or flexiv_description, so those values are
  unobtainable here (verified: no rizon/flexiv data anywhere on the image).
  The chain is instead authored from the public Rizon 4 datasheet: 7 DoF
  alternating-axis structure, ~575 mm + ~595 mm arm segments distributed over
  the link offsets below, ~920 mm max reach, joint limits +/-160 deg (odd
  joints) / +/-130 deg (even joints). Self-consistent for training/solving
  (FK/IK/Jacobian/limits all derive from the same chain) and locked by a
  golden regression test; NOT bit-parity with jrl's rizon4 — swap in the URDF
  origins when available and the golden test will flag the change.

Collision capsules are first-party "skeleton" capsules spanning consecutive
joint origins plus hand-authored extras; radii approximate the link volumes.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ikflow_tpu.robots.chain import (
    FIXED,
    PRISMATIC,
    REVOLUTE,
    Capsule,
    Joint,
    KinematicChain,
)

_PI = math.pi
_HALF_PI = math.pi / 2.0


def _skeleton_capsules(joints: Sequence[Joint], radius: float, min_len: float = 0.04) -> List[Capsule]:
    """Capsules spanning consecutive joint origins (the arm 'skeleton').

    Joint i+1's origin offset is expressed in the post-motion frame of joint i,
    which is exactly frame_index i+1 in ``KinematicChain`` (0 = base). Segments
    shorter than ``min_len`` are skipped (they add pairs but no volume).
    """
    caps = []
    for i in range(len(joints)):
        p1 = np.asarray(joints[i].xyz, dtype=np.float64)
        if np.linalg.norm(p1) < min_len:
            continue
        caps.append(Capsule(frame_index=i, p0=(0.0, 0.0, 0.0), p1=tuple(p1), radius=radius))
    return caps


# ---------------------------------------------------------------------------
# Panda (Franka Emika) — verified against the reference golden FK value.
# ---------------------------------------------------------------------------

_PANDA_JOINT_LIMITS = [
    (-2.8973, 2.8973),
    (-1.7628, 1.7628),
    (-2.8973, 2.8973),
    (-3.0718, -0.0698),
    (-2.8973, 2.8973),
    (-0.0175, 3.7525),
    (-2.8973, 2.8973),
]


def _panda_joints() -> List[Joint]:
    lims = _PANDA_JOINT_LIMITS
    return [
        Joint("panda_joint1", (0, 0, 0.333), (0, 0, 0), (0, 0, 1), REVOLUTE, lims[0]),
        Joint("panda_joint2", (0, 0, 0), (-_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[1]),
        Joint("panda_joint3", (0, -0.316, 0), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[2]),
        Joint("panda_joint4", (0.0825, 0, 0), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[3]),
        Joint("panda_joint5", (-0.0825, 0.384, 0), (-_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[4]),
        Joint("panda_joint6", (0, 0, 0), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[5]),
        Joint("panda_joint7", (0.088, 0, 0), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[6]),
        Joint("panda_joint8", (0, 0, 0.107), (0, 0, 0), (0, 0, 1), FIXED),
        Joint("panda_hand_joint", (0, 0, 0), (0, 0, -_PI / 4), (0, 0, 1), FIXED),
    ]


def _panda_capsules(joints: Sequence[Joint]) -> List[Capsule]:
    caps = _skeleton_capsules(joints, radius=0.055)
    # Hand/gripper volume beyond the flange (fingers reach ~0.11 m past hand frame).
    caps.append(Capsule(frame_index=9, p0=(0, 0, -0.02), p1=(0, 0, 0.11), radius=0.065))
    # Base column below joint1.
    caps.append(Capsule(frame_index=0, p0=(-0.04, 0, 0.0), p1=(-0.04, 0, 0.12), radius=0.09))
    return caps


def make_panda() -> KinematicChain:
    joints = _panda_joints()
    return KinematicChain("panda", joints, capsules=_panda_capsules(joints))


# ---------------------------------------------------------------------------
# Fetch — 8 DoF (torso lift + 7 arm joints), from fetch_description URDF.
# ---------------------------------------------------------------------------


def _fetch_joints(torso_actuated: bool) -> List[Joint]:
    torso_type = PRISMATIC if torso_actuated else FIXED
    torso_limits = (0.0, 0.38615) if torso_actuated else None
    return [
        Joint("torso_lift_joint", (-0.086875, 0, 0.37743), (0, 0, 0), (0, 0, 1), torso_type, torso_limits),
        Joint("shoulder_pan_joint", (0.119525, 0, 0.34858), (0, 0, 0), (0, 0, 1), REVOLUTE, (-1.6056, 1.6056)),
        Joint("shoulder_lift_joint", (0.117, 0, 0.06), (0, 0, 0), (0, 1, 0), REVOLUTE, (-1.221, 1.518)),
        Joint("upperarm_roll_joint", (0.219, 0, 0), (0, 0, 0), (1, 0, 0), REVOLUTE, (-_PI, _PI)),
        Joint("elbow_flex_joint", (0.133, 0, 0), (0, 0, 0), (0, 1, 0), REVOLUTE, (-2.251, 2.251)),
        Joint("forearm_roll_joint", (0.197, 0, 0), (0, 0, 0), (1, 0, 0), REVOLUTE, (-_PI, _PI)),
        Joint("wrist_flex_joint", (0.1245, 0, 0), (0, 0, 0), (0, 1, 0), REVOLUTE, (-2.16, 2.16)),
        Joint("wrist_roll_joint", (0.1385, 0, 0), (0, 0, 0), (1, 0, 0), REVOLUTE, (-_PI, _PI)),
        Joint("gripper_axis", (0.16645, 0, 0), (0, 0, 0), (0, 0, 1), FIXED),
    ]


def make_fetch() -> KinematicChain:
    joints = _fetch_joints(torso_actuated=True)
    caps = _skeleton_capsules(joints, radius=0.05)
    # Torso column + head mass above the shoulder.
    caps.append(Capsule(frame_index=1, p0=(0, 0, -0.35), p1=(0, 0, 0.45), radius=0.13))
    return KinematicChain("fetch", joints, capsules=caps)


def make_fetch_arm() -> KinematicChain:
    joints = _fetch_joints(torso_actuated=False)
    caps = _skeleton_capsules(joints, radius=0.05)
    caps.append(Capsule(frame_index=1, p0=(0, 0, -0.35), p1=(0, 0, 0.45), radius=0.13))
    return KinematicChain("fetch_arm", joints, capsules=caps)


# ---------------------------------------------------------------------------
# Rizon4 (Flexiv) — approximate kinematics (datasheet-derived; see module doc).
# ---------------------------------------------------------------------------

_RIZON4_JOINT_LIMITS = [
    (-2.7925, 2.7925),
    (-2.2689, 2.2689),
    (-2.7925, 2.7925),
    (-2.2689, 2.2689),
    (-2.7925, 2.7925),
    (-2.2689, 2.2689),
    (-2.7925, 2.7925),
]


def _rizon4_joints() -> List[Joint]:
    lims = _RIZON4_JOINT_LIMITS
    return [
        Joint("rizon_joint1", (0, 0, 0.155), (0, 0, 0), (0, 0, 1), REVOLUTE, lims[0]),
        Joint("rizon_joint2", (0, 0.03, 0.21), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[1]),
        Joint("rizon_joint3", (0, 0.035, 0.205), (-_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[2]),
        Joint("rizon_joint4", (0, -0.03, 0.19), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[3]),
        Joint("rizon_joint5", (0, 0.025, 0.195), (-_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[4]),
        Joint("rizon_joint6", (0, 0.03, 0.19), (_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[5]),
        Joint("rizon_joint7", (0, -0.055, 0.07), (-_HALF_PI, 0, 0), (0, 0, 1), REVOLUTE, lims[6]),
        Joint("rizon_flange", (0, 0, 0.081), (0, 0, 0), (0, 0, 1), FIXED),
    ]


def make_rizon4() -> KinematicChain:
    joints = _rizon4_joints()
    return KinematicChain("rizon4", joints, capsules=_skeleton_capsules(joints, radius=0.055))


# ---------------------------------------------------------------------------
# Registry, mirroring jrl.robots.get_robot().
# ---------------------------------------------------------------------------

_ROBOT_FACTORIES = {
    "panda": make_panda,
    "fetch": make_fetch,
    "fetch_arm": make_fetch_arm,
    "rizon4": make_rizon4,
}

_ROBOT_CACHE: Dict[str, KinematicChain] = {}


def robot_names() -> Tuple[str, ...]:
    return tuple(_ROBOT_FACTORIES)


def get_robot(name: str) -> KinematicChain:
    """Robot factory with instance caching (chains are immutable)."""
    if name not in _ROBOT_FACTORIES:
        raise ValueError(f"unknown robot {name!r}; available: {sorted(_ROBOT_FACTORIES)}")
    if name not in _ROBOT_CACHE:
        _ROBOT_CACHE[name] = _ROBOT_FACTORIES[name]()
    return _ROBOT_CACHE[name]
