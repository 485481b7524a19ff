"""Tests for the small-surface modules: math/so3, math/stats (MMD), utils.

Covers the pieces the main suites exercise only indirectly: rotation
constructors used to bake joint origins (so3), the MMD parity function
(reference ``ikflow/math_utils.py:6-43``), profiling helpers, and misc utils
(reference ``ikflow/utils.py``).
"""

import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ikflow_tpu.math.so3 import axis_angle_to_matrix, rotation_log, rpy_to_matrix_np, skew_np
from ikflow_tpu.math.stats import mmd_multiscale, mmd_multiscale_ca
from ikflow_tpu.utils.misc import boolean_string, safe_mkdir, set_seed, tensor_stats
from ikflow_tpu.utils.profiling import SectionTimes, timing_section


# ---------------------------------------------------------------------------
# so3
# ---------------------------------------------------------------------------


def test_rpy_to_matrix_axis_aligned():
    # yaw pi/2 about z: x-axis -> y-axis.
    Rz = rpy_to_matrix_np(0.0, 0.0, np.pi / 2)
    np.testing.assert_allclose(Rz @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)
    # roll pi/2 about x: y-axis -> z-axis.
    Rx = rpy_to_matrix_np(np.pi / 2, 0.0, 0.0)
    np.testing.assert_allclose(Rx @ np.array([0.0, 1, 0]), [0, 0, 1], atol=1e-12)
    # pitch pi/2 about y: z-axis -> x-axis.
    Ry = rpy_to_matrix_np(0.0, np.pi / 2, 0.0)
    np.testing.assert_allclose(Ry @ np.array([0.0, 0, 1]), [1, 0, 0], atol=1e-12)


def test_rpy_to_matrix_is_extrinsic_xyz():
    # URDF rpy is extrinsic x-y-z, i.e. R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    r, p, y = 0.3, -0.7, 1.1
    R = rpy_to_matrix_np(r, p, y)
    expected = rpy_to_matrix_np(0, 0, y) @ rpy_to_matrix_np(0, p, 0) @ rpy_to_matrix_np(r, 0, 0)
    np.testing.assert_allclose(R, expected, atol=1e-12)
    # Proper rotation: orthonormal, det +1.
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_skew_matches_cross_product():
    v = np.array([0.3, -1.2, 2.1])
    w = np.array([-0.5, 0.4, 0.9])
    np.testing.assert_allclose(skew_np(v) @ w, np.cross(v, w), atol=1e-12)
    assert np.allclose(skew_np(v), -skew_np(v).T)


def test_axis_angle_rodrigues_matches_rpy():
    # Rotation about z by theta must equal rpy(0, 0, theta).
    axis = np.array([0.0, 0.0, 1.0])
    K = jnp.asarray(skew_np(axis), jnp.float32)
    KK = K @ K
    for theta in [0.0, 0.4, -2.0, np.pi]:
        R = np.asarray(axis_angle_to_matrix(K, KK, jnp.float32(theta)))
        np.testing.assert_allclose(R, rpy_to_matrix_np(0, 0, theta), atol=1e-6)


def test_axis_angle_batched_and_log_roundtrip():
    axis = np.array([1.0, 2.0, -1.0])
    axis /= np.linalg.norm(axis)
    K = jnp.asarray(skew_np(axis), jnp.float32)
    KK = K @ K
    thetas = jnp.asarray([0.0, 1e-4, 0.5, 2.5, -1.7], jnp.float32)
    R = axis_angle_to_matrix(K, KK, thetas)
    assert R.shape == (5, 3, 3)
    logs = np.asarray(rotation_log(R))
    expected = np.asarray(thetas)[:, None] * axis[None, :]
    np.testing.assert_allclose(logs, expected, atol=2e-4)


# ---------------------------------------------------------------------------
# MMD (parity: reference ikflow/math_utils.py:6-43)
# ---------------------------------------------------------------------------


def test_mmd_zero_for_identical_samples():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 5)), jnp.float32)
    assert abs(float(mmd_multiscale(x, x))) < 1e-5


def test_mmd_separates_distributions_and_is_symmetric():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(128, 4)), jnp.float32)
    y_near = jnp.asarray(rng.normal(size=(128, 4)), jnp.float32)
    y_far = jnp.asarray(rng.normal(loc=3.0, size=(128, 4)), jnp.float32)
    near = float(mmd_multiscale(x, y_near))
    far = float(mmd_multiscale(x, y_far))
    assert far > near
    assert far > 0.1
    np.testing.assert_allclose(float(mmd_multiscale(y_far, x)), far, rtol=1e-5)


def test_mmd_matches_dense_oracle():
    # Independent dense float64 oracle of sum_a a^2/(a^2+||u-v||^2) kernel MMD.
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 3))
    y = rng.normal(loc=0.5, size=(16, 3))
    bws = (0.2, 0.5, 0.9, 1.3)

    def kmat(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return sum(w * w / (w * w + d2) for w in bws)

    oracle = kmat(x, x).mean() + kmat(y, y).mean() - 2 * kmat(x, y).mean()
    got = float(mmd_multiscale(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), bws))
    np.testing.assert_allclose(got, oracle, atol=1e-5)


def test_mmd_ca_matches_reference_goldens():
    """Golden values computed with an independent torch transcription of the
    reference kernel ``C**a * ((C+d)/a)**-a`` (math_utils.py:6-43), using the
    reference docstring's own c/a presets."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(6, 3)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(6, 3)), jnp.float64)
    r1 = float(mmd_multiscale_ca(x, y, [1.1827009364464547] * 3, [0.2, 1.0, 2.0]))
    np.testing.assert_allclose(r1, 1.1996378898620605, rtol=1e-5)
    r2 = float(mmd_multiscale_ca(x, y, [0.1, 0.2, 0.5], [0.5, 1.0, 2.0]))
    np.testing.assert_allclose(r2, 1.5501548051834106, rtol=1e-5)
    m = mmd_multiscale_ca(x, y, [0.3], [1.5], reduce=False)
    assert m.shape == (6, 6)
    np.testing.assert_allclose(float(m[0, 0]), 3.651493549346924, rtol=1e-5)
    np.testing.assert_allclose(float(m[2, 3]), -0.01280549168586731, atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(m)), 18.63864517211914, rtol=1e-5)


# ---------------------------------------------------------------------------
# utils
# ---------------------------------------------------------------------------


def test_boolean_string_truth_table():
    assert boolean_string(True) is True
    for s in ("True", "true", "1"):
        assert boolean_string(s) is True
    for s in ("False", "false", "0"):
        assert boolean_string(s) is False
    with pytest.raises(ValueError):
        boolean_string("yes")


def test_tensor_stats_fields():
    stats = tensor_stats(np.array([[1.0, np.nan], [3.0, 5.0]]), name="t")
    assert stats["name"] == "t" and stats["shape"] == (2, 2)
    assert stats["n_nan"] == 1
    assert np.isnan(stats["max"]) or stats["max"] == 5.0  # nan-propagating max is fine


def test_set_seed_reproducible_host_rng(monkeypatch):
    # Restore global RNG state + PYTHONHASHSEED afterwards so other tests'
    # randomness does not depend on execution order (ADVICE r1).
    np_state = np.random.get_state()
    py_state = random.getstate()
    monkeypatch.setenv("PYTHONHASHSEED", os.environ.get("PYTHONHASHSEED", ""))
    try:
        set_seed(123)
        a = np.random.rand(4)
        set_seed(123)
        b = np.random.rand(4)
        np.testing.assert_array_equal(a, b)
        assert os.environ["PYTHONHASHSEED"] == "123"
    finally:
        np.random.set_state(np_state)
        random.setstate(py_state)


def test_safe_mkdir_idempotent(tmp_path):
    d = str(tmp_path / "a" / "b")
    safe_mkdir(d)
    safe_mkdir(d)
    assert os.path.isdir(d)


def test_timing_section_accumulates():
    times = SectionTimes()
    for _ in range(3):
        with timing_section("stage", times=times):
            pass
    assert times.counts["stage"] == 3
    assert times.totals["stage"] >= 0.0
    assert "stage" in times.summary()


def test_timing_section_sync_blocks_on_device():
    times = SectionTimes()
    with timing_section("dev", times=times, sync=True):
        jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert times.counts["dev"] == 1


def test_timing_section_records_on_exception():
    times = SectionTimes()
    with pytest.raises(RuntimeError):
        with timing_section("boom", times=times):
            raise RuntimeError("x")
    assert times.counts["boom"] == 1
