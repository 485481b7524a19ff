"""ikflow_tpu — a TPU-native IK-sampling framework.

Brand-new implementation (not a port) of the capabilities of jstmn/ikflow:
a conditional normalizing-flow IK sampler plus batched Levenberg-Marquardt
exact-IK refinement, built on JAX/XLA/Pallas with sharded multi-chip execution.
See SURVEY.md at the repo root for the capability map of the reference.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import ikflow_tpu` light)."""
    if name == "IKFlowSolver":
        from ikflow_tpu.solver import IKFlowSolver

        return IKFlowSolver
    if name == "FlowHyperParams":
        from ikflow_tpu.flow import FlowHyperParams

        return FlowHyperParams
    if name == "get_robot":
        from ikflow_tpu.robots import get_robot

        return get_robot
    if name == "get_ik_solver":
        from ikflow_tpu.registry import get_ik_solver

        return get_ik_solver
    if name == "get_all_model_names":
        from ikflow_tpu.registry import get_all_model_names

        return get_all_model_names
    raise AttributeError(name)
