"""ctypes bindings for the native (C++) kinematics oracle.

See ``native/fk_oracle.cpp`` for the role: float64 ground-truth FK/Jacobian
(the Klampt-equivalent reference path, SURVEY.md §2.4) and the classical
damped-LM IK baseline used for benchmark comparisons
(``/root/reference/scripts/benchmark_runtime.py``'s klampt-IK role).

The shared library is built on demand from ``native/`` with make; if no
compiler is available the oracle raises at construction and all TPU-path
functionality is unaffected.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ikflow_tpu.robots.chain import FIXED, PRISMATIC, REVOLUTE, KinematicChain

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfk_oracle.so")
_LIB: Optional[ctypes.CDLL] = None

_TYPE_CODE = {REVOLUTE: 0, PRISMATIC: 1, FIXED: 2}


def _build_library() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def _load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_NATIVE_DIR, "fk_oracle.cpp")
    # (Re)build when missing or stale — the .so is never committed (it is
    # -march=native machine code), so every machine compiles its own.
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    ub = ctypes.POINTER(ctypes.c_ubyte)
    lib.fk_model_create.restype = ctypes.c_void_p
    lib.fk_model_create.argtypes = [ctypes.c_int, dp, dp, dp, ip]
    lib.fk_model_destroy.argtypes = [ctypes.c_void_p]
    lib.fk_model_ndof.restype = ctypes.c_int
    lib.fk_model_ndof.argtypes = [ctypes.c_void_p]
    lib.fk_forward.argtypes = [ctypes.c_void_p, dp, ctypes.c_int, dp]
    lib.fk_jacobian.argtypes = [ctypes.c_void_p, dp, ctypes.c_int, dp, dp]
    lib.ik_lm_solve.argtypes = [ctypes.c_void_p, dp, dp, ctypes.c_int, ctypes.c_int,
                                ctypes.c_double, ctypes.c_double, ctypes.c_double, dp, dp, ub]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeFkOracle:
    """Float64 host oracle for a ``KinematicChain`` (chain spec marshalled from
    Python — the Python chain stays the single source of truth)."""

    def __init__(self, chain: KinematicChain):
        lib = _load_library()
        self._lib = lib
        self.chain = chain
        n = len(chain.joints)
        R = np.ascontiguousarray(np.stack(chain._origins_R).reshape(n, 9), dtype=np.float64)
        t = np.ascontiguousarray(np.stack(chain._origins_t), dtype=np.float64)
        axes = np.ascontiguousarray(np.stack(chain._axes), dtype=np.float64)
        types = np.ascontiguousarray(
            np.array([_TYPE_CODE[j.joint_type] for j in chain.joints], dtype=np.int32)
        )
        self._keepalive = (R, t, axes, types)
        self._model = ctypes.c_void_p(
            lib.fk_model_create(n, _as_c(R), _as_c(t), _as_c(axes),
                                types.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        )
        assert self._model, f"fk_model_create rejected the chain (ndof > FK_MAX_NDOF?): {chain.name}"
        assert lib.fk_model_ndof(self._model) == chain.ndof

    def __del__(self):
        model = getattr(self, "_model", None)
        if model:
            self._lib.fk_model_destroy(model)

    # ------------------------------------------------------------------
    def forward_kinematics(self, q: np.ndarray) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.float64)
        assert q.ndim == 2 and q.shape[1] == self.chain.ndof, q.shape
        out = np.empty((q.shape[0], 7), dtype=np.float64)
        self._lib.fk_forward(self._model, _as_c(q), q.shape[0], _as_c(out))
        return out

    def fk_pose_and_jacobian(self, q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, dtype=np.float64)
        n, nd = q.shape
        assert nd == self.chain.ndof
        pose = np.empty((n, 7), dtype=np.float64)
        jac = np.empty((n, 6, nd), dtype=np.float64)
        self._lib.fk_jacobian(self._model, _as_c(q), n, _as_c(pose), _as_c(jac))
        return pose, jac

    def ik_lm(
        self,
        target_poses: np.ndarray,
        q0: np.ndarray,
        max_iters: int = 50,
        lambd: float = 1e-4,
        pos_tol: float = 1e-3,
        rot_tol: float = 0.01,
        clamp_to_limits: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Classical host-side LM IK baseline. Returns (q, valid)."""
        targets = np.ascontiguousarray(target_poses, dtype=np.float64)
        q = np.ascontiguousarray(q0, dtype=np.float64).copy()
        n = q.shape[0]
        assert targets.shape == (n, 7)
        valid = np.zeros(n, dtype=np.uint8)
        # NOTE: must be float64 host arrays (chain._limits_* are) — the C ABI
        # reads doubles, and a float32 array here would be reinterpreted as
        # garbage bounds.
        low = np.ascontiguousarray(self.chain._limits_low, dtype=np.float64)
        high = np.ascontiguousarray(self.chain._limits_high, dtype=np.float64)
        self._lib.ik_lm_solve(
            self._model, _as_c(targets), _as_c(q), n, max_iters, lambd, pos_tol, rot_tol,
            _as_c(low) if clamp_to_limits else None,
            _as_c(high) if clamp_to_limits else None,
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return q, valid.astype(bool)
