"""Fleet-solve and Pallas-path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.flow import build_flow, tiny_model_params
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import IKFlowSolver


def test_solve_exact_sharded_pads_and_matches_shapes():
    from ikflow_tpu.parallel.fleet import solve_exact_sharded

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 37))
    sols, valids = solve_exact_sharded(
        solver, poses, key=jax.random.PRNGKey(1), repeat_counts=(1, 2),
        n_opt_steps_max=2, allow_uninitialized=True,
    )
    assert sols.shape == (37, 7) and valids.shape == (37,)


def test_solve_exact_megabatch_streams_ragged_chunks():
    """Megabatch streaming: ragged tail padded to the compiled chunk shape,
    results written back at the right offsets, valid solutions actually valid."""
    from ikflow_tpu.lm import config_pose_errors
    from ikflow_tpu.parallel.fleet import solve_exact_megabatch

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 50))
    sols, valids = solve_exact_megabatch(
        solver, poses, chunk_size=16, key=jax.random.PRNGKey(1),
        repeat_counts=(2,), n_opt_steps_max=25, allow_uninitialized=True,
    )
    assert sols.shape == (50, 7) and valids.shape == (50,)
    assert valids.dtype == bool and valids.any(), "no pose converged with a generous budget"
    pos_err, rot_err = config_pose_errors(robot, jnp.asarray(sols[valids]), poses[valids])
    assert float(jnp.max(pos_err)) < 1e-3 + 1e-6
    assert float(jnp.max(rot_err)) < 0.1 + 1e-6


def test_megabatch_compact_retries_only_misses():
    """'compact' policy (round-5 default): tier 1 over everything, retry
    tiers solve only the host-compacted miss set; every valid solution meets
    tolerance and retried poses keep first-valid-wins semantics."""
    from ikflow_tpu.lm import config_pose_errors
    from ikflow_tpu.parallel.fleet import solve_exact_megabatch

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(2), 70))
    sols, valids = solve_exact_megabatch(
        solver, poses, chunk_size=16, key=jax.random.PRNGKey(1),
        retry_capacities="compact", repeat_counts=(1, 2, 4), n_opt_steps_max=20,
        allow_uninitialized=True,
    )
    assert sols.shape == (70, 7) and valids.shape == (70,)
    assert valids.any()
    pos_err, rot_err = config_pose_errors(robot, jnp.asarray(sols[valids]), poses[valids])
    assert float(jnp.max(pos_err)) < 1e-3 + 1e-6
    assert float(jnp.max(rot_err)) < 0.1 + 1e-6


def test_megabatch_compact_fused_single_device_matches_contract():
    """On a 1-device mesh the compact path uses fused single-dispatch chunk
    programs (fetch + solve + pack in one jit); results must satisfy the same
    contract as the sharded fallback."""
    from ikflow_tpu.lm import config_pose_errors
    from ikflow_tpu.parallel.fleet import solve_exact_megabatch
    from ikflow_tpu.parallel.mesh import make_mesh

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(5), 70))
    mesh1 = make_mesh(jax.devices()[:1])
    sols, valids = solve_exact_megabatch(
        solver, poses, chunk_size=16, mesh=mesh1, key=jax.random.PRNGKey(1),
        retry_capacities="compact", repeat_counts=(1, 2, 4), n_opt_steps_max=20,
        allow_uninitialized=True,
    )
    assert sols.shape == (70, 7) and valids.any()
    pos_err, rot_err = config_pose_errors(robot, jnp.asarray(sols[valids]), poses[valids])
    assert float(jnp.max(pos_err)) < 1e-3 + 1e-6
    assert float(jnp.max(rot_err)) < 0.1 + 1e-6
    # Fused programs are cached on the solver for reuse across calls.
    assert any(isinstance(k, tuple) and k and k[0] == "megafused"
               for k in solver._jit_cache)


def test_megabatch_probe_capacity_cache_reuse():
    """'probe' policy caches measured capacities per (solver, params,
    protocol); a second call must reuse them (no second probe entry)."""
    from ikflow_tpu.parallel import fleet

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 40))
    # Loose tolerances make every pose trivially valid — per-chunk validity
    # fluctuations of an under-budgeted solve legitimately drop the cache
    # entry (degraded-chunk handling), which is not what this test probes.
    kwargs = dict(chunk_size=16, retry_capacities="probe", repeat_counts=(2,),
                  n_opt_steps_max=1, pos_error_threshold=10.0,
                  rot_error_threshold=10.0, allow_uninitialized=True)
    fleet.solve_exact_megabatch(solver, poses, key=jax.random.PRNGKey(1), **kwargs)
    store = fleet._CAPACITY_CACHE.get(solver)
    assert store and len(store) == 1, "probe call must populate the capacity cache"
    entry = next(iter(store.values()))
    sols, valids = fleet.solve_exact_megabatch(
        solver, poses, key=jax.random.PRNGKey(2), **kwargs
    )
    assert next(iter(store.values())) == entry, "second call must reuse, not re-probe"
    assert sols.shape == (40, 7)
    # New weights invalidate the protocol key (id(params) changes).
    solver.set_params(jax.tree_util.tree_map(lambda x: x, solver.params))
    fleet.solve_exact_megabatch(solver, poses, key=jax.random.PRNGKey(3), **kwargs)
    assert len(store) == 2


def test_scaling_harness_rows():
    from ikflow_tpu.parallel.fleet import scaling_efficiency

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    rows = scaling_efficiency(
        solver, n_poses=32, reps=1, device_counts=(1, None),
        repeat_counts=(1,), n_opt_steps_max=1, allow_uninitialized=True,
    )
    assert len(rows) == 2
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == len(jax.devices())
    for r in rows:
        assert r["sols_per_s"] > 0


def test_pallas_fused_inverse_matches_jnp_interpret():
    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    padded = flow.pad_params_for_pallas(params)
    z = jax.random.normal(jax.random.PRNGKey(1), (37, flow.D))
    cond = jnp.zeros((37, flow.dim_cond))
    ref, _ = flow.inverse(params, z, cond)
    fused = flow.inverse_fused(padded, z, cond, tile_b=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=1e-4)


def test_megabatch_explicit_and_none_policies():
    """Explicit capacity tuples are used as-is; None streams uncapped."""
    from ikflow_tpu.parallel.fleet import solve_exact_megabatch

    hp = tiny_model_params()
    hp.dim_latent_space = 8
    solver = IKFlowSolver(hp, get_robot("panda"), seed=0)
    robot = solver.robot
    poses = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(7), 40))
    for policy in ((1.0, 0.5), None):
        sols, valids = solve_exact_megabatch(
            solver, poses, chunk_size=16, key=jax.random.PRNGKey(1),
            retry_capacities=policy, repeat_counts=(2, 2), n_opt_steps_max=15,
            allow_uninitialized=True,
        )
        assert sols.shape == (40, 7) and valids.shape == (40,)
        assert valids.any()
