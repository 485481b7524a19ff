"""Model registry: named model descriptions -> (solver, hyperparams).

Parity with ``/root/reference/ikflow/model_loading.py`` +
``model_descriptions.yaml``: the YAML maps a model name to hyperparameters, a
robot, and a weights location. Differences, by design:

- weights are local deploy ``.npz`` artifacts (see ``training/checkpoints.py``);
  ``weights_path`` may be absolute or relative to the models cache dir. The
  reference downloads pickled torch state dicts from GCS
  (``model_loading.py:31-49``) — this build runs in zero-egress environments
  and trains its own weights, so there is no download path, but the
  ``download_model``-shaped hook stays for file:// URLs.
- the reference's released checkpoints can't be loaded (torch pickles of a
  different framework); registry entries ship hyperparameters matching the
  reference's released models (``model_descriptions.yaml:10-97``) so a user
  can retrain equivalents.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import yaml

from ikflow_tpu import config
from ikflow_tpu.flow.params import FlowHyperParams
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import IKFlowSolver

_DESCRIPTIONS_PATH = os.path.join(os.path.dirname(__file__), "model_descriptions.yaml")
_MODEL_DESCRIPTIONS: Optional[Dict] = None


def model_descriptions() -> Dict:
    global _MODEL_DESCRIPTIONS
    if _MODEL_DESCRIPTIONS is None:
        with open(_DESCRIPTIONS_PATH) as f:
            _MODEL_DESCRIPTIONS = yaml.safe_load(f) or {}
    return _MODEL_DESCRIPTIONS


def get_all_model_names() -> List[str]:
    """Parity: ``get_all_model_names`` (``model_loading.py:26``)."""
    return list(model_descriptions().keys())


def resolve_weights_path(entry: Dict) -> Optional[str]:
    wp = entry.get("weights_path")
    if wp is None:
        return None
    if wp.startswith("file://"):
        wp = wp[len("file://") :]
    if not os.path.isabs(wp):
        # Read through the module so a cache redirected by attribute
        # reassignment (config.MODELS_DIR = ...) after import is honored.
        # (IKFLOW_TPU_CACHE_DIR is read once at config-import time.)
        # Search order: user cache first, then the repo-shipped models dir.
        candidates = [os.path.join(config.MODELS_DIR, wp)]
        candidates += [
            os.path.join(d, wp) for d in config.MODEL_SEARCH_DIRS if d != config.MODELS_DIR
        ]
        for c in candidates:
            if os.path.exists(c):
                return c
        wp = candidates[0]
    return wp


def get_ik_solver(model_name: str, allow_uninitialized: bool = False) -> Tuple[IKFlowSolver, FlowHyperParams]:
    """Build a solver for a registered model name and load its weights.

    Parity: ``get_ik_solver`` (``model_loading.py:60-90``) — returns
    ``(IKFlowSolver, hyper_parameters)``.
    """
    descriptions = model_descriptions()
    if model_name not in descriptions:
        raise ValueError(f"unknown model {model_name!r}; available: {get_all_model_names()}")
    entry = descriptions[model_name]
    hp = FlowHyperParams.from_dict(entry)
    robot = get_robot(entry["robot_name"])
    solver = IKFlowSolver(hp, robot)

    weights = resolve_weights_path(entry)
    if weights is not None and os.path.exists(weights):
        from ikflow_tpu.training.checkpoints import load_deploy

        params, header = load_deploy(weights, solver.params)
        assert header["robot_name"] == robot.name, (
            f"weights are for {header['robot_name']}, registry says {robot.name}"
        )
        solver.set_params(params)
    elif not allow_uninitialized:
        raise FileNotFoundError(
            f"weights for {model_name!r} not found at {weights!r}. Train one with "
            f"`ikflow-tpu train --robot_name {entry['robot_name']}` and export, or pass "
            "allow_uninitialized=True to build the solver without weights (generation "
            "then additionally needs the per-call allow_uninitialized flag, as in the "
            "reference's ikflow_solver.py:264)."
        )
    return solver, hp
