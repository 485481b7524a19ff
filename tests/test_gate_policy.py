"""Centralized deploy-gate policy (VERDICT r4 ask #5).

One policy source: model_descriptions.yaml ``export_gate_mm`` + the incumbent
rule in ``training/checkpoints.py::resolve_export_gate``, consumed by every
export path. These tests pin the resolution semantics.
"""

import os

import jax
import numpy as np
import pytest

from ikflow_tpu.flow import tiny_model_params, build_flow
from ikflow_tpu.robots import get_robot
from ikflow_tpu.training.checkpoints import (
    INCUMBENT_TOLERANCE_MM,
    DeployQualityError,
    export_deploy,
    registry_gate_mm,
    resolve_export_gate,
)


def _export(path, val_mm=None):
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    robot = get_robot("panda")
    params = build_flow(hp, robot).init(jax.random.PRNGKey(0))
    quality = None if val_mm is None else {"val_l2_error_mm": val_mm}
    return export_deploy(path, params, hp, robot.name, global_step=1, quality=quality)


def test_registry_gate_lookup():
    assert registry_gate_mm("panda__full.npz") == 8.0
    assert registry_gate_mm("/anywhere/panda__full_sigmoid.npz") == 13.0
    assert registry_gate_mm("not_a_registered_model.npz") is None


def test_resolver_no_incumbent_uses_policy(tmp_path):
    gate, source = resolve_export_gate(str(tmp_path / "panda__full_sigmoid.npz"))
    assert gate == 13.0 and "registry" in source


def test_resolver_backstop_for_unregistered(tmp_path):
    gate, source = resolve_export_gate(str(tmp_path / "mystery.npz"))
    assert gate == 100.0 and "backstop" in source


def test_incumbent_rule_tightens_below_policy(tmp_path):
    # Incumbent far better than policy: only noise-level regression allowed.
    path = _export(str(tmp_path / "panda__full.npz"), val_mm=5.0)
    gate, source = resolve_export_gate(path)
    assert gate == pytest.approx(5.0 + INCUMBENT_TOLERANCE_MM)
    assert "incumbent" in source


def test_incumbent_rule_relaxes_above_policy(tmp_path):
    # Incumbent worse than policy: an improvement ships even above policy
    # (the round-4 sigmoid-finalize case), but a regression never does.
    path = _export(str(tmp_path / "panda__full.npz"), val_mm=15.0)
    gate, _ = resolve_export_gate(path)
    assert gate == pytest.approx(15.0)


def test_explicit_override_still_guarded_by_incumbent(tmp_path):
    path = _export(str(tmp_path / "panda__full.npz"), val_mm=5.0)
    gate, _ = resolve_export_gate(path, policy_gate_mm=50.0)
    assert gate == pytest.approx(5.0 + INCUMBENT_TOLERANCE_MM)


def test_export_refused_by_resolved_gate(tmp_path):
    path = _export(str(tmp_path / "panda__full.npz"), val_mm=5.0)
    gate, _ = resolve_export_gate(path)
    with pytest.raises(DeployQualityError):
        _export_with_gate(path, val_mm=9.0, gate=gate)
    # An improvement passes.
    _export_with_gate(path, val_mm=4.0, gate=gate)


def _export_with_gate(path, val_mm, gate):
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    robot = get_robot("panda")
    params = build_flow(hp, robot).init(jax.random.PRNGKey(0))
    return export_deploy(
        path, params, hp, robot.name, global_step=2,
        quality={"val_l2_error_mm": val_mm}, max_val_l2_mm=gate,
    )
