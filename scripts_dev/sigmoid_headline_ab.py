"""A/B: does the sigmoid flagship beat the affine flagship on the exact-IK
headline protocol (n=1000, tiers (1,3,10), 3 LM steps, 1mm/0.572deg)?

Round-5 motivation: panda__full__sigmoid became the table's most accurate row
(6.79 mm eval vs the affine flagship's 7.89), and exact-IK throughput under
measured-capacity compaction is driven by tier-1 validity (more first-try
converges -> narrower retry capacities -> less retry work). But the sigmoid
head also costs extra elementwise ops per inverse pass. Same methodology as
bench.py (probe -> derive_retry_capacities -> chained-scan differencing with
wide deltas, 3 repeats); writes SIGMOID_HEADLINE_AB_r05.json.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ikflow_tpu.config import enable_compile_cache
from ikflow_tpu.registry import get_ik_solver
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import derive_retry_capacities
from ikflow_tpu.utils.profiling import measure_per_iter_s

N_POSES = 1000
REPEAT_COUNTS = (1, 3, 10)
POS_TOL, ROT_TOL = 1e-3, 0.01
N_OPT_STEPS = 3
LATENT_SCALE = 0.75
K_DELTAS = (40, 120)
N_MEASUREMENTS = 3


def measure(model_name: str, targets, ks):
    solver, _ = get_ik_solver(model_name)

    def exact_args(poses, k, capacities, tier_counts=False):
        return solver._exact_impl(
            solver.params, solver.params, poses, k, REPEAT_COUNTS, POS_TOL,
            ROT_TOL, N_OPT_STEPS, 1e-4, LATENT_SCALE, capacities,
            return_tier_counts=tier_counts,
        )

    t0 = time.time()
    probe = jax.jit(lambda k: exact_args(targets, k, None, tier_counts=True))
    _, probe_valids, tier_counts = probe(ks)
    tier_counts = np.asarray(tier_counts)
    compile_s = time.time() - t0
    capacities = derive_retry_capacities(tier_counts, N_POSES, len(REPEAT_COUNTS))

    def chained(params, poses, key0, iters):
        def body(carry, i):
            k, acc = carry
            k = jax.random.fold_in(k, i)
            poses_dep = poses + (acc * 1e-30)
            sols, valids = exact_args(poses_dep, k, capacities)
            return (k, jnp.sum(sols) * 1e-6), jnp.sum(valids)

        (_, acc), valid_counts = jax.lax.scan(
            body, (key0, jnp.float32(0.0)), jnp.arange(iters)
        )
        return acc, jnp.min(valid_counts)

    jits = {}

    def exact_jit(iters):
        if iters not in jits:
            jits[iters] = jax.jit(lambda p, t, k, _i=iters: chained(p, t, k, _i))
        return jits[iters]

    def build(iters):
        fn = exact_jit(iters)
        return lambda i: float(fn(solver.params, targets, jax.random.fold_in(ks, i))[0])

    t0 = time.time()
    _, valid_count = exact_jit(2)(solver.params, targets, ks)
    float(exact_jit(2 + K_DELTAS[0])(solver.params, targets, ks)[0])
    compile_s += time.time() - t0

    reps = sorted(
        measure_per_iter_s(build, f"exact {model_name}", k_deltas=K_DELTAS)
        for _ in range(N_MEASUREMENTS)
    )
    median = reps[len(reps) // 2]
    return {
        "sols_per_s": round(N_POSES / median, 1),
        "sols_per_s_spread": {"min": round(N_POSES / reps[-1], 1),
                              "max": round(N_POSES / reps[0], 1)},
        "tier_valid_counts": tier_counts.tolist(),
        "retry_capacities": list(capacities) if capacities is not None else None,
        "valid_fraction": round(int(valid_count) / N_POSES, 4),
        "uncapped_valid_fraction": round(float(np.mean(np.asarray(probe_valids))), 4),
        "compile_s": round(compile_s, 1),
    }


def main() -> int:
    enable_compile_cache()
    robot = get_robot("panda")
    kq, ks = jax.random.split(jax.random.PRNGKey(0))
    targets = robot.forward_kinematics(
        robot.sample_joint_angles(kq, N_POSES, joint_limit_eps=0.02)
    )
    out = {
        "protocol": f"exact IK n={N_POSES}, tiers {REPEAT_COUNTS}, {N_OPT_STEPS} LM steps, "
                    f"1mm/0.572deg, latent scale {LATENT_SCALE}, k_deltas {K_DELTAS}, "
                    f"{N_MEASUREMENTS} repeats (bench.py methodology; same pose draw/keys both legs)",
    }
    for leg, name in (("affine", "panda__full__lp191_5.25m"),
                      ("sigmoid", "panda__full__sigmoid")):
        out[leg] = {"model": name, **measure(name, targets, ks)}
        print(leg, out[leg])
    a, s = out["affine"]["sols_per_s"], out["sigmoid"]["sols_per_s"]
    out["decision"] = (
        f"sigmoid {'WINS' if s > a else 'loses'}: {s:.0f} vs {a:.0f} sols/s "
        f"({(s / a - 1) * 100:+.1f}%)"
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "SIGMOID_HEADLINE_AB_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(out["decision"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
