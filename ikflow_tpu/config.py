"""Global configuration: dtypes and cache directories.

Parity with ``/root/reference/ikflow/config.py`` (DEVICE / DEFAULT_TORCH_DTYPE /
cache tree), re-thought for JAX: there is no global device pin — placement is
controlled by jit/sharding — and the default compute dtype is float32 with
bfloat16 opt-in for the coupling-subnet matmuls (MXU-friendly).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

DEFAULT_DTYPE = jnp.float32

# Cache tree (mirrors ~/.cache/ikflow/{datasets,models,training_logs}, see
# /root/reference/ikflow/config.py:12-18).
CACHE_DIR = os.environ.get(
    "IKFLOW_TPU_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "ikflow_tpu")
)
DATASET_DIR = os.path.join(CACHE_DIR, "datasets")
MODELS_DIR = os.path.join(CACHE_DIR, "models")
TRAINING_LOGS_DIR = os.path.join(CACHE_DIR, "training_logs")

# Repo-shipped weights: deploy .npz artifacts committed next to the package
# (<repo>/models). Searched after MODELS_DIR so a user's cache overrides the
# shipped weights; lets the registry/bench/tests find trained weights with
# zero environment setup (the reference instead downloads from GCS at call
# time, model_loading.py:31-49).
REPO_MODELS_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "models"))
MODEL_SEARCH_DIRS = (MODELS_DIR, REPO_MODELS_DIR)

# Dataset tag constants (parity: /root/reference/ikflow/config.py:21-23).
DATASET_TAG_NON_SELF_COLLIDING = "non-self-colliding"
ALL_DATASET_TAGS = [DATASET_TAG_NON_SELF_COLLIDING]

# Scaling bound for padding dims ahead of the sigmoid head
# (parity: SIGMOID_SCALING_ABS_MAX, /root/reference/ikflow/config.py:31).
SIGMOID_SCALING_ABS_MAX = 1.0

def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (explicit opt-in, no import side effect).

    Over a tunneled/remote TPU backend a single large program (the 500-step
    training scan, the tiered exact-IK solve) takes minutes to compile, and
    watchdog-restarted trainers otherwise pay it on every relaunch. Called by
    this package's CLI entry points, bench.py, and the test conftest — a plain
    ``import ikflow_tpu`` never mutates process-global JAX config (an
    application embedding the library keeps its own cache settings). Opt out
    with IKFLOW_TPU_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("IKFLOW_TPU_NO_COMPILE_CACHE", "0") != "1":
        try:  # pragma: no cover - depends on backend support
            jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_DIR, "xla_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass


def ensure_cache_dirs() -> None:
    for d in (CACHE_DIR, DATASET_DIR, MODELS_DIR, TRAINING_LOGS_DIR):
        os.makedirs(d, exist_ok=True)
