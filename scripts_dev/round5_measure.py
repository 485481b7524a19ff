"""Round-5 measurement battery: serving megabatch + capped runtime curve.

One process (OPERATIONS.md rule 3: every fresh process pays the ~290 s
first-transfer stall), invoking the benchmark CLI's run() in-process and
capturing its JSON rows into the round-5 artifacts:

- MEGABATCH_r05.json  — 100k-pose streaming solve, cold (fresh probe) and
  warm (cached capacities) legs, at the NEW default chunking
  (probe/tail 2048, steady 16384, pipelined collection).
- RUNTIME_CURVE_r05.json — capped exact-IK curve re-measured with wide
  differencing deltas (k_deltas=(20,80); the r4 curve's batch-1000 point used
  delta=5 iterations ~ 20 ms, inside tunnel-RTT jitter). Uncapped rows are
  carried from RUNTIME_CURVE_r04.json (solver tier code unchanged in r5).
"""

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _pathfix  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = "panda__full__lp191_5.25m"


def cli_rows(**overrides):
    """Run the benchmark CLI in-process, return its JSON rows."""
    from ikflow_tpu.cli.bench_cmd import run

    args = argparse.Namespace(
        model_name=FLAGSHIP, robot_name="panda",
        batch_sizes=[1, 10, 100, 1000, 5000, 10000], mode="exact", k=5,
        n_opt_steps_max=3, repeat_counts=[1, 3, 10], uninitialized=False,
        seed=0, sweep_nb_nodes=None, scaling=False, megabatch=None,
        chunk_size=2048, steady_chunk=16384, compare=False,
        differencing=False, capacity="probe",
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = run(args)
    assert rc == 0, f"benchmark CLI failed (rc={rc})"
    rows = []
    for line in buf.getvalue().splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
        else:
            print(f"  [cli] {line}", flush=True)
    return rows


def main():
    from ikflow_tpu.config import enable_compile_cache

    enable_compile_cache()

    # ---- 1. Megabatch: compact (cross-chunk miss compaction, round-5
    # default) vs probe (capped in-batch tiers), sweeping steady_chunk so the
    # committed default is the measured optimum, not a guess.
    mega = {}
    for policy, steady in (("compact", 32768), ("compact", 65536), ("probe", 32768)):
        print(f"megabatch: capacity={policy} steady_chunk={steady}", flush=True)
        rows = cli_rows(megabatch=100000, steady_chunk=steady, capacity=policy)
        mega[(policy, steady)] = rows[-1]
        print(f"  -> {json.dumps(rows[-1])}", flush=True)

    best = max(mega, key=lambda s: mega[s]["sols_per_s"])
    artifact = dict(mega[best])
    artifact["policy_sweep"] = {
        f"{p}@{s}": {"sols_per_s": r["sols_per_s"], "warm_sols_per_s": r["warm_sols_per_s"]}
        for (p, s), r in mega.items()
    }
    artifact["dispatch"] = (
        "compact: async tier-1 pass over steady chunks, host-side compaction "
        "of measured misses, per-tier fixed-shape retry chunks; no probe, "
        "cold == warm. probe: uncapped probe chunk -> capped steady chunks, "
        "warm leg reuses cached capacities."
    )
    with open(os.path.join(REPO, "MEGABATCH_r05.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote MEGABATCH_r05.json", flush=True)

    # ---- 2. Capped runtime curve with wide differencing deltas.
    if os.path.exists(os.path.join(REPO, "RUNTIME_CURVE_r05.json")):
        print("RUNTIME_CURVE_r05.json already present; skipping curve", flush=True)
        return
    print("runtime curve (capped, wide deltas)", flush=True)
    capped = cli_rows(differencing=True)
    for r in capped:
        print(f"  -> {json.dumps(r)}", flush=True)

    with open(os.path.join(REPO, "RUNTIME_CURVE_r04.json")) as f:
        r04 = json.load(f)
    curve = {
        "protocol": r04["protocol"] + " Round-5 capped rows use k_deltas=(20,80) "
        "(>=0.1 s differenced deltas; the r4 rows accepted deltas as small as 5 "
        "iterations, within tunnel-RTT jitter at n>=1000).",
        "reference_anchor": r04["reference_anchor"],
        "capped": capped,
        "uncapped": r04["uncapped"],
        "uncapped_provenance": "RUNTIME_CURVE_r04.json (solver tier code unchanged in r5)",
    }
    with open(os.path.join(REPO, "RUNTIME_CURVE_r05.json"), "w") as f:
        json.dump(curve, f, indent=1)
    print("wrote RUNTIME_CURVE_r05.json", flush=True)


if __name__ == "__main__":
    main()
