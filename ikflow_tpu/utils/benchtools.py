"""Chained-program builders for RTT-cancelling device timing.

On a tunneled TPU, per-call wall clock measures dispatch round-trip, not
device time. The fix used across this repo (``bench.py``, the benchmark CLI's
runtime curve, the evaluate CLI's runtime column) is *chained-scan
differencing*: run K solves inside one ``lax.scan`` where each iteration
data-depends on the previous (so the device cannot overlap them), time the
program at two K values, and difference — dispatch and RTT appear in both
terms and cancel. Degenerate (noise-dominated) deltas are refused by
``profiling.measure_per_iter_s``, never reported.

Note: these builders call solver internals (``_exact_impl``/``_inverse_q``)
directly and so bypass the public API's weights-loaded guard — deliberate for
a timing tool (random weights execute identical FLOPs), but callers that
surface rates to users must state the weights provenance alongside the
number (bench.py reports ``"weights": "trained" | "random(untrained)"``).

``bench.py`` keeps its own copies of these chained programs on purpose: its
HLO must stay bit-identical across rounds so the persistent XLA cache and
cross-round comparisons hold; behavioral changes belong here first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chained_exact_build(
    solver,
    poses,
    key,
    repeat_counts=(1, 3, 10),
    pos_tol: float = 1e-3,
    rot_tol: float = 0.01,
    n_opt_steps_max: int = 3,
    latent_scale: float = 0.75,
    capacities=None,
):
    """``build(iters)`` factory for a chained exact-IK program over ``poses``.

    Each scan iteration re-solves the full tiered exact-IK program
    (``solver._exact_impl``) with a value-neutral data dependency on the
    previous iteration's solutions. Pass the result to
    ``profiling.measure_per_iter_s`` to get seconds per full solve.
    """
    jits = {}

    def chained(params, poses_in, key0, iters):
        def body(carry, i):
            k, acc = carry
            k = jax.random.fold_in(k, i)
            poses_dep = poses_in + (acc * 1e-30)  # data dependency, value-neutral
            aux = solver._padded_params if solver._use_pallas else params
            sols, valids = solver._exact_impl(
                params, aux, poses_dep, k, tuple(repeat_counts), pos_tol, rot_tol,
                n_opt_steps_max, 1e-4, latent_scale, capacities,
            )
            acc = jnp.sum(sols) * 1e-6
            return (k, acc), jnp.sum(valids)

        (_, acc), valid_counts = jax.lax.scan(
            body, (key0, jnp.float32(0.0)), jnp.arange(iters)
        )
        return acc, jnp.min(valid_counts)

    def build(iters):
        if iters not in jits:
            jits[iters] = jax.jit(lambda p, t, k, _i=iters: chained(p, t, k, _i))
        fn = jits[iters]
        return lambda i: float(fn(solver.params, poses, jax.random.fold_in(key, i))[0])

    return build


def chained_approx_build(solver, poses, key, latent_scale: float = 1.0, scale_iters: int = 1):
    """``build(iters)`` factory for a chained approximate-IK (one flow inverse
    + clamp per solution) program over ``poses``. ``scale_iters`` multiplies
    the scan length (an approx solve is ~100x cheaper than an exact one, so
    the delta needs more iterations to clear timer noise); the caller must
    divide the measured per-iteration time by ``scale_iters``.
    """
    robot = solver.robot
    jits = {}

    def chained(params, poses_in, key0, iters):
        def body(carry, i):
            k, acc = carry
            k = jax.random.fold_in(k, i)
            cond = solver._conditional(poses_in + acc * 1e-30)
            latent = latent_scale * jax.random.normal(
                k, (poses_in.shape[0], solver.network_width), jnp.float32
            )
            aux = solver._padded_params if solver._use_pallas else params
            q = solver._inverse_q(params, aux, latent, cond)
            sols = robot.clamp_to_joint_limits(q[:, : robot.ndof])
            return (k, jnp.sum(sols) * 1e-6), None

        (_, acc), _ = jax.lax.scan(body, (key0, jnp.float32(0.0)), jnp.arange(iters))
        return acc

    def build(iters):
        n = scale_iters * iters
        if n not in jits:
            jits[n] = jax.jit(lambda p, t, k, _i=n: chained(p, t, k, _i))
        fn = jits[n]
        return lambda i: float(fn(solver.params, poses, jax.random.fold_in(key, i)))

    return build
