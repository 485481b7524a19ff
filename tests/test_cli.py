"""CLI smoke tests (in-process; tiny sizes)."""

import os
import tempfile

import numpy as np
import pytest

from ikflow_tpu.cli.main import main


def test_solve_cli(capsys):
    rc = main(["solve", "--robot_name", "panda", "--pose", "0.4", "0", "0.5", "1", "0", "0", "0",
               "-n", "2", "--uninitialized"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pos_err" in out and out.count("q=") == 2


def test_evaluate_cli(capsys):
    rc = main(["evaluate", "--robot_name", "panda", "--uninitialized", "--testset_size", "8",
               "--n_samples_for_errors", "2", "--runtime_k", "1", "--n_runtime_samples", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    for field in ("mean_l2_error_mm", "mean_angular_error_deg", "pct_joint_limits_exceeded",
                  "pct_self_colliding", "mean_runtime_ms"):
        assert field in out


def test_benchmark_cli(capsys):
    rc = main(["benchmark", "--robot_name", "panda", "--batch_sizes", "4", "--mode", "approx",
               "--k", "1", "--uninitialized"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"mode": "approx"' in out and '"sols_per_s"' in out


def test_build_dataset_cli(capsys, tmp_path):
    rc = main(["build-dataset", "--robot_name", "panda", "--training_set_size", "256",
               "--test_set_size", "64", "--output_dir", str(tmp_path / "ds")])
    assert rc == 0
    assert os.path.exists(tmp_path / "ds" / "dataset.npz")


def test_utils_parity():
    from ikflow_tpu.utils import boolean_string, tensor_stats

    assert boolean_string("True") and not boolean_string("false")
    with pytest.raises(ValueError):
        boolean_string("maybe")
    stats = tensor_stats(np.array([1.0, 2.0, 3.0]), "x")
    assert stats["mean"] == 2.0 and stats["n_nan"] == 0


def test_visualize_interactive_html(tmp_path):
    """--interactive writes a self-contained orbitable 3-D scene: all template
    placeholders substituted, JSON payload shaped as the renderer expects."""
    import json
    import re

    from ikflow_tpu.cli.main import main

    out = str(tmp_path / "scene.html")
    rc = main(["visualize", "--robot_name", "panda", "--demo_name", "oscillate_target",
               "--interactive", "--uninitialized", "--n_frames", "4", "--output", out])
    assert rc == 0
    html = open(out).read()
    assert "__DATA__" not in html and "__TITLE__" not in html
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1))
    assert len(data["frames"]) == 4
    f0 = data["frames"][0]
    assert len(f0["sols"]) == 6 and len(f0["target"]) == 3
    cap = f0["sols"][0][0]
    assert len(cap) == 3 and len(cap[0]) == 3
