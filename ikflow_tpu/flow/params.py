"""Flow hyperparameters.

Parity with ``IkflowModelParameters`` (``/root/reference/ikflow/model.py:17-48``):
same field names and defaults so registry YAML entries hydrate identically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict


@dataclasses.dataclass
class FlowHyperParams:
    coupling_layer: str = "glow"
    nb_nodes: int = 12
    dim_latent_space: int = 9
    coeff_fn_config: int = 3  # subnet depth (number of hidden LeakyReLU layers)
    coeff_fn_internal_size: int = 1024  # subnet width
    permute_random_enabled: bool = True
    sigmoid_on_output: bool = False

    # Loss / training parameters (parity: model.py:27-35).
    lambd_predict: float = 1.0
    init_scale: float = 0.04473500291638653  # kept for config parity; unused in
    # the reference main path as well (defined at model.py:29, never read).
    rnvp_clamp: float = 2.5
    y_noise_scale: float = 1e-7
    zeros_noise_scale: float = 1e-3

    softflow_noise_scale: float = 0.01
    softflow_enabled: bool = True

    # TPU-native extensions (not in the reference):
    # "atan": s_clamped = clamp * (2/pi) * atan(s)        (FrEIA >= 0.2 rewrite)
    # "atan_scaled": s_clamped = clamp * (2/pi) * atan(s/clamp)  (pre-rewrite FrEIA)
    clamp_activation: str = "atan"
    # Compute the two hidden-layer matmuls of each coupling subnet in bfloat16
    # (params and accumulations stay float32). Big MXU win, small accuracy cost.
    bf16_hidden: bool = False

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "FlowHyperParams":
        """Hydrate from a registry YAML dict, ignoring unknown keys — mirrors the
        ``__dict__.update`` hydration at ``/root/reference/ikflow/model_loading.py:86-88``
        plus the missing-``sigmoid_on_output`` shim at ``ikflow_solver.py:41-44``."""
        hp = cls()
        known = {f.name for f in dataclasses.fields(cls)}
        for k, v in d.items():
            if k in known:
                setattr(hp, k, v)
        return hp

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def __str__(self) -> str:
        s = "FlowHyperParams\n"
        for k, v in dataclasses.asdict(self).items():
            s += f"  {k}: \t{v}\n"
        return s


def tiny_model_params() -> FlowHyperParams:
    """Small fixture for fast tests (parity: TINY_MODEL_PARAMS,
    ``/root/reference/ikflow/model.py:45-48``)."""
    hp = FlowHyperParams()
    hp.nb_nodes = 3
    hp.coeff_fn_config = 2
    hp.coeff_fn_internal_size = 256
    return hp


TINY_MODEL_PARAMS = tiny_model_params()
