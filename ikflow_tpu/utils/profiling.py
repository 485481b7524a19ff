"""Profiling helpers: timing sections + XLA profiler traces.

The reference instruments with ad-hoc ``time()`` deltas
(``ikflow_solver.py:97,109,168``, ``lt_model.py:188-198``); here the same
lightweight pattern is a context manager, plus a wrapper around
``jax.profiler`` for real TPU traces (viewable in TensorBoard/XProf).

Caveat: in async dispatch (always, on TPU) a ``timing_section`` around
un-synchronized device calls measures dispatch, not execution — pass
``sync=True`` (or block on results) for wall-clock truth, and prefer the
chained-scan methodology in ``bench.py`` on tunneled devices.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class SectionTimes:
    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def add(self, name: str, dt: float) -> None:
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"  {name}: {total * 1000:.2f} ms total / {n} calls = {total / n * 1000:.3f} ms/call")
        return "\n".join(lines)


GLOBAL_TIMES = SectionTimes()


@contextlib.contextmanager
def timing_section(name: str, times: Optional[SectionTimes] = None, sync: bool = False) -> Iterator[None]:
    """``with timing_section("lma"):`` — accumulates into GLOBAL_TIMES."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            import jax
            import jax.numpy as jnp

            # Block on a trivial jitted COMPUTATION (not a transfer): the TPU
            # compute stream is FIFO per device, so a computation enqueued now
            # completes only after all previously dispatched programs. A bare
            # device_put rides the transfer stream and gives no such ordering.
            jax.block_until_ready(jax.jit(lambda: jnp.zeros(()))())
        (times or GLOBAL_TIMES).add(name, time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Chained-scan differencing: RTT-cancelling device timing for tunneled chips.
# ---------------------------------------------------------------------------


class DegenerateTimingError(RuntimeError):
    """The chained-differencing delta is indistinguishable from timer noise.

    Raised instead of emitting a number: round 2 committed a physically
    impossible 5e12 sols/s (p50 0.0 ms) because tunnel-RTT variance exceeded
    the timed delta and a ``max(..., 1e-9)`` clamp turned a non-positive
    difference into garbage."""


def _timed_median(fn, reps: int, time_fn=time.time):
    """Median + spread of ``reps`` timed calls of ``fn(i)``."""
    ts = []
    for i in range(reps):
        t0 = time_fn()
        fn(i)
        ts.append(time_fn() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[-1] - ts[0]


def measure_per_iter_s(build, label: str, k_deltas=(5, 20), reps_schedule=(3, 5, 9),
                       floor_s: float = 2e-5, time_fn=time.time) -> float:
    """Seconds per chained iteration via differencing, or raise.

    ``build(iters)`` returns a ``fn(i)`` that executes a chained device
    program with ``iters`` iterations (each iteration data-depends on the
    previous, so the device cannot overlap them) and blocks on the result.
    The per-iteration time is ``(t(2+K) - t(2)) / K`` — host dispatch and
    tunnel RTT appear in both terms and cancel.

    The measurement is accepted only when the delta exceeds both a hard floor
    and 3x the observed rep-to-rep spread; otherwise the rep count is raised,
    then the iteration delta is widened, and finally the measurement is
    REFUSED (:class:`DegenerateTimingError`) rather than reported.
    """
    for k_delta in k_deltas:
        k_small, k_large = 2, 2 + k_delta
        run_small, run_large = build(k_small), build(k_large)
        run_small(0)  # compile / warm
        run_large(0)
        for reps in reps_schedule:
            t_small, spread_small = _timed_median(run_small, reps, time_fn)
            t_large, spread_large = _timed_median(run_large, reps, time_fn)
            delta = t_large - t_small
            noise = max(spread_small, spread_large)
            if delta > max(3.0 * noise, floor_s):
                return delta / k_delta
    raise DegenerateTimingError(
        f"{label}: t_large - t_small <= max(3x noise, {floor_s}s) at every "
        f"rep/delta escalation — refusing to report a noise-dominated rate"
    )


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """XLA profiler trace context (open the dir in TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
