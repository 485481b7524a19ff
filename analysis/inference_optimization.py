"""Inference-optimization study: backend x batch-size runtime matrix.

Parity with the reference's ``notebooks/inference_optimization.ipynb`` (a
torch.compile configuration study): here the knobs are the XLA vs fused-Pallas
flow-inverse backends, batch size, and bf16 hidden matmuls. Prints a JSON row
per cell. Timing uses the chained-scan method (robust to async dispatch and
tunneled devices — see bench.py).

Run on the accelerator: python analysis/inference_optimization.py
"""

from __future__ import annotations
import _pathfix  # noqa: F401  (repo-root sys.path bootstrap)

import argparse
import json
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_sizes", type=int, nargs="*", default=[512, 2048, 8192, 32768])
    parser.add_argument("--backends", nargs="*", default=["xla", "pallas"])
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ikflow_tpu.flow import FlowHyperParams, build_flow
    from ikflow_tpu.robots import get_robot

    robot = get_robot("panda")
    hp = FlowHyperParams()
    hp.dim_latent_space = 7
    hp.bf16_hidden = args.bf16
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    padded = flow.pad_params_for_pallas(params)

    def chained(fn, a, iters):
        # The accumulator perturbs the next iteration's input (value-neutral at
        # 1e-30) so XLA cannot hoist the loop-invariant computation out of the
        # scan — without this the "benchmark" measures a single pass.
        def run():
            def body(c, _):
                a_dep = (a[0],) + (a[1] + c * 1e-30,) + a[2:]
                out = fn(*a_dep)
                return c + jnp.sum(out) * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return acc

        return jax.jit(run)

    for B in args.batch_sizes:
        z = jax.random.normal(jax.random.PRNGKey(1), (B, flow.D))
        cond = jnp.zeros((B, flow.dim_cond))
        for backend in args.backends:
            if backend == "xla":
                fn, a = (lambda p, zz, c: flow.inverse(p, zz, c)[0]), (params, z, cond)
            else:
                fn, a = flow.inverse_fused, (padded, z, cond)
            try:
                k1 = chained(fn, a, args.iters)
                k2 = chained(fn, a, 2 * args.iters)
                float(k1())
                float(k2())
                t1s, t2s = [], []
                for _ in range(3):
                    t0 = time.time(); float(k1()); t1s.append(time.time() - t0)
                    t0 = time.time(); float(k2()); t2s.append(time.time() - t0)
                per = (sorted(t2s)[1] - sorted(t1s)[1]) / args.iters
                print(json.dumps({
                    "backend": backend, "batch": B, "bf16": args.bf16,
                    "ms_per_pass": round(1000 * per, 3),
                    "samples_per_s": round(B / per, 0),
                }))
            except Exception as e:  # e.g. Pallas unavailable on this backend
                print(json.dumps({"backend": backend, "batch": B, "error": str(e)[:120]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
