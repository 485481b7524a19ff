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


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """XLA profiler trace context (open the dir in TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
