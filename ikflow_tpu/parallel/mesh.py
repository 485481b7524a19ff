"""Device mesh + sharding helpers: the distribution layer.

The reference is strictly single-GPU (``Trainer(devices=[GPU_IDX])``,
``/root/reference/scripts/train.py:249-250``; no torch.distributed anywhere —
SURVEY.md §2.5). Here distribution is first-class and deliberately simple: the
model is a ~10 MB MLP flow over <=10-dim vectors, so the one large axis is the
pose x latent *batch*. The mesh is therefore 1-D (``("data",)``): batch sharded
across chips, parameters replicated, gradients reduced by the compiler-inserted
all-reduce over ICI (DCN between hosts after ``jax.distributed.initialize``).
No TP/PP/SP/EP is warranted at this model scale — documented as a decision,
not an omission.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading axis sharded over the data axis."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime init (DCN). Call before any jax op.

    With an explicit ``coordinator_address`` the cluster spec is passed
    through. Without one, auto-detection runs ONLY when a recognizable
    cluster environment marker is present (SLURM, Cloud TPU pod, or JAX
    coordinator env vars) — on a plain machine this is a silent no-op, and
    on a marked cluster host an init failure surfaces instead of being
    swallowed (a cluster that fails to initialize is a real error, not a
    single-process run). Afterwards ``jax.devices()`` spans all hosts and the
    same 1-D data mesh recipe applies — jit inserts cross-host collectives
    automatically.
    """
    # NOTE: must not touch jax.process_count()/jax.devices() here — querying
    # them initializes the local XLA backend, and jax.distributed.initialize()
    # raises if any backend is already initialized. is_initialized() only
    # inspects the distributed client state.
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    import os

    env = os.environ
    # A marker must indicate MULTI-process, not merely cluster tooling: dev
    # images set TPU_WORKER_HOSTNAMES=localhost on single-host machines, and
    # single-task SLURM jobs set SLURM_JOB_ID — neither is a pod.
    coordinator_markers = (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )
    n_tpu_hosts = len([h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()])
    is_cluster = (
        any(env.get(m) for m in coordinator_markers)
        or (env.get("SLURM_JOB_ID") and int(env.get("SLURM_NTASKS", "1")) > 1)
        or n_tpu_hosts > 1
    )
    if not is_cluster:
        return  # plain single-process machine: nothing to do
    jax.distributed.initialize()  # auto-detect pod/SLURM/env cluster spec
