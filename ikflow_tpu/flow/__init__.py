from ikflow_tpu.flow.model import GlowFlow, apply_subnet, build_flow, init_subnet
from ikflow_tpu.flow.params import TINY_MODEL_PARAMS, FlowHyperParams, tiny_model_params

__all__ = [
    "GlowFlow",
    "apply_subnet",
    "build_flow",
    "init_subnet",
    "FlowHyperParams",
    "TINY_MODEL_PARAMS",
    "tiny_model_params",
]
