"""ikflow_tpu — a TPU-native IK-sampling framework.

Brand-new implementation (not a port) of the capabilities of jstmn/ikflow:
a conditional normalizing-flow IK sampler plus batched Levenberg-Marquardt
exact-IK refinement, built on JAX/XLA/Pallas with sharded multi-chip execution.
See SURVEY.md at the repo root for the capability map of the reference.
"""

__version__ = "0.1.0"
