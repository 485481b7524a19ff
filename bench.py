"""Headline benchmark: exact-IK solutions/s/chip at 1 mm / 0.572 deg tolerance.

Protocol (matches the reference's headline benchmark,
``/root/reference/scripts/benchmark_generate_exact_solutions.py:18-19,145-151``
and the in-source CUDA timing at ``ikflow_solver.py:150-162``):
n=1000 target poses, retry tiers (1, 3, 10), <=3 LM steps per tier,
tolerance 1 mm position / 0.01 rad rotation. Baseline: the reference's
recorded CUDA total of 0.236 s for 1000 poses -> 4237 solutions/s.

Convergence is first-class: the reference's protocol solves essentially all
poses, so the timed configuration must too. Retry-tier capacities are derived
from a *measured* uncapped probe run (2x headroom over the observed per-tier
miss rates), never assumed; the resulting ``valid_fraction`` is reported and
the capacity optimization is only kept if it preserves valid_fraction.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context fields (valid_fraction, p50 latency, compile time) are included
in the same object.

Weights: uses the trained deploy artifact for the flagship Panda model when
present in the models cache or the repo-shipped models dir (or
$IKFLOW_TPU_BENCH_WEIGHTS); otherwise runs the same computation with random
weights (identical FLOPs/timing; validity is then seed-starved and reported
as-is).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLS_PER_S = 1000.0 / 0.236  # reference CUDA, ikflow_solver.py:150-162
N_POSES = int(os.environ.get("IKFLOW_TPU_BENCH_N", 1000))
REPEAT_COUNTS = (1, 3, 10)
N_OPT_STEPS = 3
POS_TOL = 1e-3
ROT_TOL = 0.01
TIMED_REPS = 5
# Headline measurement hygiene (round 5): the r3/r4 headline spread (28%
# across four same-protocol runs) traced to small differencing deltas — at
# k_delta=5 the timed delta is ~16 ms of device work against several ms of
# tunnel-RTT jitter, so a single accepted measurement can be off +-20%. The
# exact leg now uses deltas of >=40 chained iterations (~130 ms device time,
# noise <5%) and repeats the whole measurement N_MEASUREMENTS times,
# reporting min/median/max in the JSON line.
EXACT_K_DELTAS = (40, 120)
N_MEASUREMENTS = 3


# Degeneracy-rejecting differencing methodology (shared with the evaluate CLI
# runtime column): see ikflow_tpu/utils/profiling.py.
from ikflow_tpu.utils.profiling import (  # noqa: E402
    DegenerateTimingError,
    measure_per_iter_s,
)


# Shared with the fleet serving paths (fleet.solve_exact_megabatch probes its
# first chunk with exactly this derivation) — one implementation, in the library.
from ikflow_tpu.solver import derive_retry_capacities  # noqa: E402


def main() -> int:
    from ikflow_tpu.config import MODEL_SEARCH_DIRS, enable_compile_cache

    enable_compile_cache()
    from ikflow_tpu.flow import FlowHyperParams
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.solver import IKFlowSolver

    # Which flagship: 'sigmoid' (panda__full_sigmoid, bounded-output
    # 12-block — the serving default and most accurate table row) or
    # 'affine' (panda__full, the rounds-1-4 headline model, kept for
    # round-over-round comparability). Default sigmoid per the measured A/B
    # (SIGMOID_HEADLINE_AB_r05.json: +2.3%, tier-1 908 vs 905 -> narrower
    # retry capacities; full-bench validation 276.4k vs 274.1k sols/s).
    bench_model = os.environ.get("IKFLOW_TPU_BENCH_MODEL", "sigmoid")
    hp = FlowHyperParams()
    hp.dim_latent_space = 7  # flagship panda architecture
    if bench_model == "sigmoid":
        hp.sigmoid_on_output = True
        hp.softflow_enabled = False
        weights_file = "panda__full_sigmoid.npz"
    else:
        weights_file = "panda__full.npz"
    robot = get_robot("panda")

    weights_path = os.environ.get("IKFLOW_TPU_BENCH_WEIGHTS")
    if not weights_path:
        for d in MODEL_SEARCH_DIRS:
            cand = os.path.join(d, weights_file)
            if os.path.exists(cand):
                weights_path = cand
                break
        else:
            weights_path = os.path.join(MODEL_SEARCH_DIRS[0], weights_file)
    use_pallas = os.environ.get("IKFLOW_TPU_BENCH_PALLAS", "0") == "1"
    # bf16 hidden matmuls on the MXU for the flow-inverse seed pass. Exact-IK
    # validity is insensitive to seed precision (the LM refinement runs f32 and
    # corrects the seeds), so this trades nothing measurable for MXU rate.
    hp.bf16_hidden = os.environ.get("IKFLOW_TPU_BENCH_BF16", "0") == "1"
    solver = IKFlowSolver(hp, robot, seed=0, use_pallas=use_pallas)
    weights_loaded = False
    if os.path.exists(weights_path):
        from ikflow_tpu.training.checkpoints import load_deploy

        params, _ = load_deploy(weights_path, solver.params)
        solver.set_params(params)
        weights_loaded = True

    key = jax.random.PRNGKey(0)
    kq, ks = jax.random.split(key)
    targets = robot.forward_kinematics(
        robot.sample_joint_angles(kq, N_POSES, joint_limit_eps=0.02)
    )

    compile_s = 0.0

    # Seed latent scale 0.75: the solver's default (measured tier-1 validity
    # optimum — see generate_exact_ik_solutions docstring); the protocol's
    # tolerance/tiers/LM budget are unchanged from the reference.
    LATENT_SCALE = 0.75

    def exact_args(poses, k, capacities, tier_counts=False):
        aux = solver._padded_params if solver._use_pallas else solver.params
        return solver._exact_impl(
            solver.params, aux, poses, k, REPEAT_COUNTS, POS_TOL, ROT_TOL,
            N_OPT_STEPS, 1e-4, LATENT_SCALE, capacities, return_tier_counts=tier_counts,
        )

    # ---- Probe: one uncapped solve measuring per-tier convergence. The retry
    # capacities for the timed run are derived from these MEASURED miss rates
    # (2x headroom), so the capacity optimization can never silently abandon
    # poses the way a hardcoded capacity schedule could.
    probe = jax.jit(lambda k: exact_args(targets, k, None, tier_counts=True))
    t0 = time.time()
    _, probe_valids, tier_counts = probe(ks)
    tier_counts = np.asarray(tier_counts)
    compile_s += time.time() - t0
    uncapped_valid_fraction = float(np.mean(np.asarray(probe_valids)))

    capacities = (
        derive_retry_capacities(tier_counts, N_POSES, len(REPEAT_COUNTS))
        if weights_loaded else None
    )

    def chained(params, poses, key0, iters):
        def body(carry, i):
            k, acc = carry
            k = jax.random.fold_in(k, i)
            poses_dep = poses + (acc * 1e-30)  # data dependency, value-neutral
            sols, valids = exact_args(poses_dep, k, capacities)
            acc = jnp.sum(sols) * 1e-6
            return (k, acc), jnp.sum(valids)
        (_, acc), valid_counts = jax.lax.scan(
            body, (key0, jnp.float32(0.0)), jnp.arange(iters)
        )
        return acc, jnp.min(valid_counts)

    # Jitted chained-exact programs, cached per iteration count. ``chained``
    # reads ``capacities`` from this scope at trace time, so the cache must be
    # cleared whenever capacities change.
    exact_jits = {}

    def exact_jit(iters):
        if iters not in exact_jits:
            exact_jits[iters] = jax.jit(lambda p, t, k, _i=iters: chained(p, t, k, _i))
        return exact_jits[iters]

    def build_exact(iters):
        fn = exact_jit(iters)
        return lambda i: float(fn(solver.params, targets, jax.random.fold_in(ks, i))[0])

    t0 = time.time()
    _, valid_count = exact_jit(2)(solver.params, targets, ks)
    valid_count = int(valid_count)
    compile_s += time.time() - t0
    t0 = time.time()
    float(exact_jit(2 + EXACT_K_DELTAS[0])(solver.params, targets, ks)[0])  # compile large
    compile_s += time.time() - t0

    # Guard: if the capped run converges fewer poses than the uncapped probe
    # (beyond noise), the capacity schedule is lying — rerun uncapped.
    if capacities is not None and valid_count / N_POSES < uncapped_valid_fraction - 0.005:
        capacities = None
        exact_jits.clear()
        t0 = time.time()
        _, valid_count = exact_jit(2)(solver.params, targets, ks)
        valid_count = int(valid_count)
        float(exact_jit(2 + EXACT_K_DELTAS[0])(solver.params, targets, ks)[0])
        compile_s += time.time() - t0

    # Host<->device round-trip jitter, for attribution: this is the noise the
    # differencing deltas must clear. Measured on a trivial jitted program.
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))  # compile
    rtts = []
    for _ in range(12):
        t0 = time.time()
        float(trivial(jnp.float32(0.0)))
        rtts.append(time.time() - t0)
    rtts.sort()
    rtt_median_ms = 1000 * rtts[len(rtts) // 2]
    rtt_spread_ms = 1000 * (rtts[-1] - rtts[0])

    # N_MEASUREMENTS independent differenced measurements; the headline is the
    # median and the min/max bound the run-to-run spread (VERDICT r4 weak #1).
    per_iter_measurements = [
        measure_per_iter_s(build_exact, "exact-IK batch", k_deltas=EXACT_K_DELTAS)
        for _ in range(N_MEASUREMENTS)
    ]
    ordered = sorted(per_iter_measurements)
    median_s = ordered[len(ordered) // 2]
    sols_per_s = N_POSES / median_s

    # Approximate-IK throughput (the reference's evaluate_inference_speed
    # axis: one flow-inverse + clamp per solution, no refinement), same
    # chained-scan differencing on the same N_POSES batch.
    def chained_approx(params, poses, key0, iters):
        def body(carry, i):
            k, acc = carry
            k = jax.random.fold_in(k, i)
            cond = solver._conditional(poses + acc * 1e-30)
            latent = jax.random.normal(k, (poses.shape[0], solver.network_width), jnp.float32)
            aux = solver._padded_params if solver._use_pallas else params
            q = solver._inverse_q(params, aux, latent, cond)
            sols = robot.clamp_to_joint_limits(q[:, : robot.ndof])
            return (k, jnp.sum(sols) * 1e-6), None
        (_, acc), _ = jax.lax.scan(body, (key0, jnp.float32(0.0)), jnp.arange(iters))
        return acc, jnp.zeros(())

    approx_jits = {}

    def build_approx(iters):
        # 8x the exact leg's iteration counts: one approx solve is ~100x
        # cheaper, so the delta needs more iterations to clear timer noise.
        if iters not in approx_jits:
            approx_jits[iters] = jax.jit(
                lambda p, t, k, _i=8 * iters: chained_approx(p, t, k, _i)
            )
        fn = approx_jits[iters]
        return lambda i: float(fn(solver.params, targets, jax.random.fold_in(ks, i))[0])

    t0 = time.time()
    build_approx(2)(0)
    build_approx(2 + 4 * TIMED_REPS)(0)
    compile_s += time.time() - t0
    approx_s = measure_per_iter_s(
        build_approx, "approx-IK batch", k_deltas=(4 * TIMED_REPS, 16 * TIMED_REPS)
    ) / 8.0
    approx_sols_per_s = N_POSES / approx_s

    # Single-pose p50 latency (the BASELINE.json "p50 latency per target
    # pose" axis): same differencing methodology on a 1-pose batch. jit
    # retraces the chained program for the (1, 7) shape automatically. This
    # leg's deltas are milliseconds against tunnel-RTT noise, so it is the
    # most degeneracy-prone: on refusal it reports null instead of a number.
    one = targets[:1]

    def build_single(iters):
        fn = exact_jit(iters)
        return lambda i: float(fn(solver.params, one, jax.random.fold_in(ks, i))[0])

    t0 = time.time()
    build_single(2)(0)
    build_single(2 + 8 * TIMED_REPS)(0)
    compile_s += time.time() - t0
    try:
        single_pose_s = measure_per_iter_s(
            build_single, "single-pose exact-IK",
            k_deltas=(8 * TIMED_REPS, 32 * TIMED_REPS),
        )
    except DegenerateTimingError as e:
        print(f"WARNING: {e}", file=sys.stderr)
        single_pose_s = None

    # ---- Physical sanity: refuse to emit impossible numbers (r2 shipped a
    # 5e12-sols/s artifact; these checks make that a crash, not a JSON line).
    if sols_per_s > 1.05 * approx_sols_per_s:
        raise DegenerateTimingError(
            f"exact-IK rate {sols_per_s:.0f}/s exceeds the approx-IK rate "
            f"{approx_sols_per_s:.0f}/s — exact does strictly more work per "
            f"solution, so one of the two measurements is corrupt"
        )
    if approx_sols_per_s > 5e7:
        raise DegenerateTimingError(
            f"approx-IK rate {approx_sols_per_s:.0f}/s exceeds the physical "
            f"ceiling of this chip for a {hp.coeff_fn_internal_size}-wide "
            f"{hp.nb_nodes}-block flow"
        )

    result = {
        "metric": "exact_ik_solutions_per_s_per_chip",
        "value": round(sols_per_s, 1),
        "unit": f"solutions/s/chip (n={N_POSES}, tiers (1,3,10), 3 LM steps, 1mm/0.572deg)",
        "vs_baseline": round(sols_per_s / BASELINE_SOLS_PER_S, 3),
        "valid_fraction": round(valid_count / N_POSES, 4),
        "uncapped_valid_fraction": round(uncapped_valid_fraction, 4),
        "repeats": N_MEASUREMENTS,
        "sols_per_s_spread": {
            "min": round(N_POSES / ordered[-1], 1),
            "median": round(sols_per_s, 1),
            "max": round(N_POSES / ordered[0], 1),
        },
        "per_iter_ms_measurements": [round(1000 * m, 4) for m in per_iter_measurements],
        "rtt_ms": {"median": round(rtt_median_ms, 2), "spread": round(rtt_spread_ms, 2)},
        "tier_valid_counts": [int(c) for c in tier_counts],
        "p50_latency_ms_per_batch": round(1000 * median_s, 2),
        "approx_ik_solutions_per_s": round(approx_sols_per_s, 1),
        "p50_single_pose_latency_ms": (
            None if single_pose_s is None else round(1000 * single_pose_s, 3)
        ),
        "compile_s": round(compile_s, 1),
        "weights": "trained" if weights_loaded else "random(untrained)",
        "model": bench_model,
        "retry_capacities": list(capacities) if capacities else "full",
        "backend": ("pallas" if use_pallas else "xla") + ("+bf16" if hp.bf16_hidden else ""),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


def run_with_retry(fn=main) -> int:
    """Run the bench, retrying ONCE on a transient failure.

    The TPU tunnel can drop a remote compile mid-flight (observed in round 4:
    "response body closed" killed a cold-cache bench leg). One in-process
    retry survives that failure mode — already-finished XLA programs persist
    in the compile cache, so the second attempt resumes roughly where the
    first died. Degenerate-timing refusals are REAL measurement failures and
    stay fatal: a retry would just launder them into a number.
    """
    try:
        return fn()
    except (KeyboardInterrupt, DegenerateTimingError):
        raise
    except Exception as e:  # transient tunnel/runtime error
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); retrying once",
              file=sys.stderr)
        return fn()


if __name__ == "__main__":
    sys.exit(run_with_retry())
