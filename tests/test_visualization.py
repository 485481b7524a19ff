"""Visualization smoke tests (headless renders)."""

import os

import pytest

from ikflow_tpu.robots import get_robot


def test_visualize_fk_writes_png(tmp_path):
    from ikflow_tpu.visualization import visualize_fk

    out = visualize_fk(get_robot("panda"), n_configs=2, out_path=str(tmp_path / "fk.png"))
    assert os.path.getsize(out) > 10_000


def test_oscillate_latent_writes_gif(tmp_path):
    from ikflow_tpu.flow import tiny_model_params
    from ikflow_tpu.solver import IKFlowSolver
    from ikflow_tpu.visualization import oscillate_latent

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    out = oscillate_latent(solver, n_frames=4, out_path=str(tmp_path / "o.gif"))
    assert os.path.getsize(out) > 10_000
