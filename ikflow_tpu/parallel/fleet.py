"""Fleet-scale exact-IK: shard target poses across the mesh.

The SURVEY.md §2.5 "exact-IK fleet solve" design: target poses x repeat tiles
are sharded over the ``("data",)`` axis; every chip runs the same fixed-shape
tier program on its shard (LM iterations are embarrassingly parallel per
pose); the only cross-chip communication is the tiny psum of the per-tier
valid counts that drives the ``lax.cond`` tier-skipping — which the compiler
inserts automatically because the tier predicate ``jnp.all(valids)`` is a
reduction over the sharded axis.

Also provides the scaling-efficiency harness the reference lacks entirely
(it is single-GPU, ``/root/reference/scripts/train.py:249-250``).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.parallel.mesh import DATA_AXIS, batch_sharding, make_mesh


def solve_exact_sharded(
    solver,
    target_poses: jnp.ndarray,
    mesh=None,
    **solve_kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shard poses over the mesh and run the solver's exact-IK program.

    Pads the pose count up to a multiple of the mesh size (padded poses are
    copies of pose 0; their results are dropped). Returns (solutions, valids)
    with the original length — plus cumulative per-tier valid counts (over the
    padded set) when ``return_tier_counts=True`` is passed through.
    """
    mesh = mesh or make_mesh()
    n = target_poses.shape[0]
    d = mesh.devices.size
    n_pad = ((n + d - 1) // d) * d
    if n_pad != n:
        pad = jnp.broadcast_to(target_poses[:1], (n_pad - n, 7))
        target_poses = jnp.concatenate([target_poses, pad], axis=0)
    poses_sharded = jax.device_put(target_poses, batch_sharding(mesh))
    out = solver.generate_exact_ik_solutions(poses_sharded, **solve_kwargs)
    if solve_kwargs.get("return_tier_counts"):
        sols, valids, tier_counts = out
        return sols[:n], valids[:n], tier_counts
    sols, valids = out
    return sols[:n], valids[:n]


def solve_exact_megabatch(
    solver,
    target_poses,
    chunk_size: int = 8192,
    mesh=None,
    key: Optional[jax.Array] = None,
    progress: bool = False,
    retry_capacities="probe",
    steady_chunk_max: int = 131072,
    **solve_kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-IK over an arbitrarily large pose set by streaming fixed-shape
    chunks through ONE compiled tier program.

    The 100k-poses-at-scale serving shape (BASELINE.json config 4): a single
    jit over 100k poses x 10 repeat tiles would hold ~1M x 1024-wide subnet
    activations live in HBM, so instead the pose stream is cut into
    ``chunk_size`` pieces, each padded to exactly chunk_size (constant shape =
    one compile, reused for every chunk including the ragged last one) and
    sharded over the mesh. Results land in preallocated host arrays —
    device memory stays bounded by one chunk regardless of n.

    ``retry_capacities`` (the serving-scale throughput lever — uncapped, every
    retry tier re-solves all chunk poses x its repeat count, ~14x the tier-1
    work for tiers (1,3,10) regardless of how few poses actually missed):

    - ``"probe"`` (default): the FIRST chunk runs uncapped with per-tier valid
      counts, its results are kept, and measured capacities
      (``solver.derive_retry_capacities``, 2x headroom over observed miss
      rates) drive every remaining chunk. Per-chunk validity is monitored: any
      capped chunk whose valid fraction drops >0.5% below the probe's is
      re-solved uncapped, so a drifting pose distribution degrades to probe
      cost, never to abandoned poses.
    - an explicit tuple: used as-is for all chunks (no probe, no re-solve).
    - ``None``: every chunk uncapped (reference-shaped behavior).

    ``steady_chunk_max``: once measured capacities are in hand, the capped
    tier program touches ~(1 + 2*miss_1*r_2 + 2*miss_2*r_3)·rows ≈ 1.2-2·n
    seed rows instead of the uncapped 14·n, so HBM permits MUCH larger chunks
    than the probe's — and on a tunneled chip every extra chunk costs
    dispatch/collection round-trips that dominate the stream (measured: 12
    chunks of 8192 ran at 57k sols/s while the same poses in 2 programs run
    >2x faster). Capped steady-state chunks therefore coalesce up to this
    row count (default 128k; tier-1 activations ~1 GB at 1024-wide subnets).
    Uncapped streams (policy ``None`` or a refused probe) keep ``chunk_size``.
    """
    mesh = mesh or make_mesh()
    key = key if key is not None else jax.random.PRNGKey(0)
    target_poses = np.asarray(target_poses)
    n = target_poses.shape[0]
    sols_out = np.zeros((n, solver.ndof), dtype=np.float32)
    valid_out = np.zeros((n,), dtype=bool)
    probing = retry_capacities == "probe"
    capacities = None if probing else retry_capacities
    probe_valid_fraction = None

    def padded_chunk(start, size):
        chunk = target_poses[start : start + size]
        m = chunk.shape[0]
        if m < size:  # pad ragged tail to keep the compiled shape
            chunk = np.concatenate(
                [chunk, np.broadcast_to(chunk[:1], (size - m, 7))], axis=0
            )
        return chunk, m

    consumed = 0
    if probing and n > 0:
        # Probe chunk (blocks: the capacities gate everything downstream).
        chunk, m = padded_chunk(0, chunk_size)
        s, v, tier_counts = solve_exact_sharded(
            solver, jnp.asarray(chunk), mesh=mesh, key=jax.random.fold_in(key, 0),
            retry_capacities=None, return_tier_counts=True, **solve_kwargs,
        )
        from ikflow_tpu.solver import derive_retry_capacities

        tier_counts = np.asarray(tier_counts)
        capacities = derive_retry_capacities(tier_counts, chunk.shape[0], len(tier_counts))
        probe_valid_fraction = float(np.asarray(v).mean())
        sols_out[:m] = np.asarray(s)[:m]
        valid_out[:m] = np.asarray(v)[:m]
        consumed = m
        if progress and capacities is not None:
            print(f"  megabatch: probe capacities {[round(c, 4) for c in capacities]}",
                  flush=True)

    # Steady-state chunking: capped tiers have a ~10x smaller HBM footprint
    # than the probe's uncapped ones, so coalesce (fewer chunks = fewer
    # tunnel round-trips, the dominant cost of the stream).
    steady = chunk_size if capacities is None else min(
        max(chunk_size, n - consumed), steady_chunk_max
    )

    # Dispatch every remaining chunk WITHOUT blocking between them (jax async
    # dispatch queues the fixed-shape programs back-to-back on the device;
    # host->device uploads of chunk i+1 overlap chunk i's compute).
    pending = []
    for start in range(consumed, n, steady):
        chunk, m = padded_chunk(start, steady)
        s, v = solve_exact_sharded(
            solver, jnp.asarray(chunk), mesh=mesh,
            key=jax.random.fold_in(key, start), retry_capacities=capacities,
            **solve_kwargs,
        )
        pending.append((start, m, s, v))

    # Collect (synchronizes chunk-by-chunk in completion order).
    degraded = []
    for start, m, s, v in pending:
        v_np = np.asarray(v)
        sols_out[start : start + m] = np.asarray(s)[:m]
        valid_out[start : start + m] = v_np[:m]
        if (
            probing
            and capacities is not None
            and float(v_np[:m].mean()) < probe_valid_fraction - 0.005
        ):
            degraded.append((start, m))
        if progress:
            done = min(start + steady, n)
            print(f"  megabatch: {done}/{n} poses ({100 * done / n:.0f}%)", flush=True)

    # Rare: a capped chunk converged measurably fewer poses than the uncapped
    # probe — its pose distribution outran the capacity schedule. Re-solve
    # those poses uncapped in probe-sized pieces (a steady-size uncapped
    # program would pay the 14x-tile HBM footprint the coalescing relies on
    # avoiding), with fresh keys so the retry isn't a replay.
    for start, m in degraded:
        for sub in range(start, start + m, chunk_size):
            chunk, ms = padded_chunk(sub, chunk_size)
            ms = min(ms, start + m - sub)
            s, v = solve_exact_sharded(
                solver, jnp.asarray(chunk), mesh=mesh,
                key=jax.random.fold_in(jax.random.fold_in(key, sub), 1),
                retry_capacities=None, **solve_kwargs,
            )
            sols_out[sub : sub + ms] = np.asarray(s)[:ms]
            valid_out[sub : sub + ms] = np.asarray(v)[:ms]
        if progress:
            print(f"  megabatch: re-solved degraded chunk at {start} uncapped", flush=True)
    return sols_out, valid_out


def scaling_efficiency(
    solver,
    n_poses: int = 1024,
    device_counts=(1, None),
    reps: int = 3,
    key: Optional[jax.Array] = None,
    **solve_kwargs,
):
    """Throughput at 1 device vs d devices -> efficiency = T_d / (d * T_1).

    Returns a list of {devices, seconds, sols_per_s, efficiency} dicts. On a
    real pod this measures ICI scaling; on the virtual CPU mesh it validates
    the mechanics (the devices share host cores, so efficiency is not
    meaningful there).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    robot = solver.robot
    poses = robot.forward_kinematics(
        robot.sample_joint_angles(jax.random.fold_in(key, 1), n_poses, joint_limit_eps=0.02)
    )
    all_devices = jax.devices()
    rows = []
    base_throughput = None
    for dc in device_counts:
        dc = len(all_devices) if dc is None else dc
        mesh = make_mesh(all_devices[:dc])
        # Warm-up/compile.
        sols, valids = solve_exact_sharded(solver, poses, mesh=mesh, key=key, **solve_kwargs)
        sols.block_until_ready()
        ts = []
        for r in range(reps):
            t0 = time.time()
            sols, _ = solve_exact_sharded(
                solver, poses, mesh=mesh, key=jax.random.fold_in(key, r), **solve_kwargs
            )
            sols.block_until_ready()
            ts.append(time.time() - t0)
        sec = sorted(ts)[len(ts) // 2]
        thr = n_poses / sec
        if base_throughput is None:
            base_throughput = thr / dc  # per-device at the first count
        rows.append(
            {
                "devices": dc,
                "seconds": sec,
                "sols_per_s": thr,
                "efficiency": thr / (dc * base_throughput),
            }
        )
    return rows
