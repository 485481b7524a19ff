"""Checkpointing + deploy export.

Training checkpoints use Orbax (step-tagged, keep-latest-k — parity with the
reference's Lightning ``ModelCheckpoint`` cadence, ``/root/reference/scripts/
train.py:232-241``). The *deploy* format — what the model registry serves — is
a single compressed ``.npz`` of flattened parameters plus a JSON hyperparameter
header, replacing the reference's pickled torch ``state_dict``
(``download_model_from_wandb_checkpoint.py:13-28`` / ``ikflow_solver.py:413``)
with something architecture-checkable and framework-neutral.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ikflow_tpu.flow.params import FlowHyperParams


# ---------------------------------------------------------------------------
# Orbax training checkpoints.
# ---------------------------------------------------------------------------


def save_checkpoint(directory: str, step: int, params, opt_state=None, keep: int = 3) -> str:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mgr:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        mgr.save(step, args=ocp.args.StandardSave(payload))
    return os.path.join(directory, str(step))


def latest_checkpoint_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(directory) as mgr:
        return mgr.latest_step()


def restore_checkpoint(directory: str, step: Optional[int] = None, template=None):
    """Restore {params[, opt_state]} from an Orbax checkpoint dir."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        assert step is not None, f"no checkpoints in {directory}"
        if template is not None:
            return mgr.restore(step, args=ocp.args.StandardRestore(template)), step
        return mgr.restore(step), step


# ---------------------------------------------------------------------------
# Deploy format (.npz + hyperparameter JSON header).
# ---------------------------------------------------------------------------


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


class DeployQualityError(ValueError):
    """Raised when a deploy export fails the quality gate (diverged/unconverged
    weights must never ship silently — the r2 ``fetch__large`` artifact was
    exported from a run whose own metrics said ``val/l2_error_mm: Infinity``)."""


# No-regression tolerance for the incumbent rule below: re-exporting an
# artifact of statistically-equal quality (e.g. the end-of-run export after a
# periodic export of the same weights) must not be refused over val noise.
INCUMBENT_TOLERANCE_MM = 0.25


def read_deploy_header(path: str) -> Optional[Dict]:
    """Header dict of a deploy artifact, or None if unreadable/absent."""
    try:
        with np.load(path) as z:
            return json.loads(bytes(z["__header__"]).decode())
    except Exception:
        return None


def registry_gate_mm(artifact_path: str) -> Optional[float]:
    """Per-model deploy-gate policy for an artifact path, from the registry.

    The single source of truth is ``model_descriptions.yaml``'s
    ``export_gate_mm`` field (round-5 centralization — gate values previously
    lived scattered across shell scripts). Matching is by artifact basename
    against each entry's ``weights_path``. Returns None for artifacts no
    registry entry ships.
    """
    from ikflow_tpu.registry import model_descriptions

    base = os.path.basename(artifact_path)
    if not base.endswith(".npz"):
        base += ".npz"
    for entry in model_descriptions().values():
        wp = entry.get("weights_path")
        if wp and os.path.basename(wp) == base and "export_gate_mm" in entry:
            return float(entry["export_gate_mm"])
    return None


def resolve_export_gate(
    artifact_path: str, policy_gate_mm: Optional[float] = None
) -> Tuple[Optional[float], str]:
    """Effective deploy gate (mm) for exporting to ``artifact_path``.

    One policy, consumed by every export path (trainer ``--export``, the
    fallback exporter ``scripts_dev/export_from_checkpoint.py``, finalize
    scripts):

    1. The base bound is ``policy_gate_mm`` if given, else the registry's
       ``export_gate_mm`` for this artifact, else 100 mm (the historical
       diverged-weights backstop).
    2. **Incumbent rule** (when the target artifact already exists with a
       quality header, incumbent val ``v``): the effective gate is
       ``max(v, min(base, v + INCUMBENT_TOLERANCE_MM))`` — i.e. an export is
       allowed iff it improves on the shipped model OR meets the policy bar
       without regressing the incumbent beyond val-measurement noise. This
       is the round-4 "beat-the-incumbent" rule made symmetric: a
       still-above-policy improvement ships (the sigmoid-finalize case), but
       a worse-than-shipped export never silently overwrites a better model
       even when it would meet the policy bar.

    Returns ``(gate_mm, source)`` where ``source`` documents the resolution
    for logs/headers.
    """
    base = policy_gate_mm
    source = f"explicit {base}" if base is not None else None
    if base is None:
        base = registry_gate_mm(artifact_path)
        source = f"registry {base}" if base is not None else None
    if base is None:
        base, source = 100.0, "default backstop 100.0"
    header = read_deploy_header(artifact_path) if os.path.exists(artifact_path) else None
    incumbent = (header or {}).get("quality", {}).get("val_l2_error_mm")
    if incumbent is not None and np.isfinite(incumbent):
        v = float(incumbent)
        bound = max(v, min(base, v + INCUMBENT_TOLERANCE_MM))
        if bound != base:
            return bound, (f"{source}; incumbent rule (shipped val {v:.2f}, "
                           f"tolerance {INCUMBENT_TOLERANCE_MM})")
    return base, source


def export_deploy(
    path: str,
    params,
    hyper_parameters: FlowHyperParams,
    robot_name: str,
    global_step: Optional[int] = None,
    dtype: Optional[str] = None,
    quality: Optional[Dict[str, float]] = None,
    max_val_l2_mm: Optional[float] = None,
    warm_start: Optional[Dict] = None,
) -> str:
    """Write the deploy artifact: params + hparams + robot in one .npz.

    ``dtype`` (e.g. "float16") halves the artifact for distribution; weights
    are cast back to the model dtype at load time (``load_deploy``). The
    stored dtype is recorded in the header.

    ``warm_start`` (e.g. ``{"from": "models/x.npz", "prior_steps": 200000,
    "total_steps": 700000}``) records anneal provenance: ``global_step``
    stays this *run's* step count (gate/step semantics unchanged) while the
    header remains honest about cumulative training depth — a warm-started
    artifact would otherwise under-report how much compute produced it.

    ``quality`` (e.g. ``{"val_l2_error_mm": 8.1}``) is embedded in the header
    so the artifact is self-describing. When ``max_val_l2_mm`` is given, the
    export REFUSES (raises :class:`DeployQualityError`) if the measured
    ``val_l2_error_mm`` is missing/non-finite or exceeds the gate — callers
    that deliberately ship an unconverged artifact must pass
    ``max_val_l2_mm=None`` and the header will still carry the bad number.

    Returns the actual path written (np.savez appends '.npz' when missing)."""
    if max_val_l2_mm is not None:
        v = None if quality is None else quality.get("val_l2_error_mm")
        if v is None or not np.isfinite(v) or v > max_val_l2_mm:
            raise DeployQualityError(
                f"refusing deploy export to {path!r}: val_l2_error_mm={v} "
                f"fails the quality gate (max {max_val_l2_mm} mm). Pass "
                f"max_val_l2_mm=None / --export_force to ship anyway."
            )
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = {
        "format_version": 1,
        "robot_name": robot_name,
        "global_step": global_step,
        "hyper_parameters": hyper_parameters.to_dict(),
        "stored_dtype": dtype or "native",
    }
    if quality is not None:
        header["quality"] = {
            k: (v if isinstance(v, str) else float(v)) for k, v in quality.items()
        }
        header["quality_gate_mm"] = max_val_l2_mm
    if warm_start is not None:
        header["warm_start"] = {
            k: (v if isinstance(v, str) else int(v)) for k, v in warm_start.items()
        }
    flat = _flatten_params(params)
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    np.savez_compressed(path, __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8), **flat)
    return path


def load_deploy(path: str, params_template) -> Tuple[Any, Dict]:
    """Load a deploy artifact back into the given params pytree structure.

    The template (from ``flow.init``) supplies the tree structure; shapes are
    validated leaf-by-leaf so an architecture mismatch fails loudly (the
    reference's pickle load fails with inscrutable key errors instead).
    """
    z = np.load(path)
    header = json.loads(bytes(z["__header__"]).decode())
    flat = {k: z[k] for k in z.files if k != "__header__"}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    new_leaves = []
    for path_elems, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_elems)
        assert key in flat, f"missing parameter {key!r} in {path}"
        arr = flat[key]
        assert arr.shape == leaf.shape, f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}"
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), header
