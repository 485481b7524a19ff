"""Small utilities, parity with ``/root/reference/ikflow/utils.py``.

Notable difference: ``set_seed`` seeds numpy/python for host-side code only —
device RNG is controlled exclusively by explicit ``jax.random`` keys (the
reference's global torch seeding at ``utils.py:75-83`` has no JAX analog, by
design; see SURVEY.md §7 "RNG discipline").
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np


def set_seed(seed: int = 0) -> None:
    """Seed host-side RNGs (numpy, python, PYTHONHASHSEED)."""
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def boolean_string(s) -> bool:
    """argparse-friendly bool parser (parity: ``utils.py:155-160``)."""
    if isinstance(s, bool):
        return s
    if str(s) not in ("True", "False", "true", "false", "1", "0"):
        raise ValueError(f"{s} is not a valid boolean string")
    return str(s) in ("True", "true", "1")


def safe_mkdir(directory: str) -> None:
    """mkdir -p (parity: ``utils.py:176-178``)."""
    os.makedirs(directory, exist_ok=True)


def tensor_stats(arr, name: str = "tensor") -> Dict[str, float]:
    """Summary stats dict (parity with the printer at ``utils.py:104-138``)."""
    a = np.asarray(arr)
    return {
        "name": name,
        "shape": tuple(a.shape),
        "dtype": str(a.dtype),
        "min": float(a.min()),
        "max": float(a.max()),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "n_nan": int(np.isnan(a).sum()),
    }
