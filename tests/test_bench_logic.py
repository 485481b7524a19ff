"""Unit tests for bench.py's measured-capacity derivation (the logic that
keeps the headline benchmark honest — VERDICT r1: hardcoded capacities
silently abandoned 57% of poses when tier-1 validity was low)."""

import sys

sys.path.insert(0, "/root/repo")

from bench import derive_retry_capacities


def test_well_trained_flow_gets_tight_caps():
    # 95% tier-1 validity on 1000 poses -> tier-2 cap 2*50=100 poses = 0.1.
    caps = derive_retry_capacities([950, 998, 1000], 1000, 3)
    assert caps[0] == 1.0
    assert caps[1] == 0.1
    assert caps[2] == 32 / 1000  # 2*2=4 misses, floored at 32 poses


def test_undertrained_flow_runs_uncapped():
    # 43% tier-1 validity (round 1's actual number) -> no capping at all.
    assert derive_retry_capacities([433, 600, 700], 1000, 3) is None


def test_moderate_miss_rates_capped_with_headroom():
    caps = derive_retry_capacities([800, 950, 990], 1000, 3)
    assert caps == (1.0, 0.4, 0.1)  # 2*200=400, 2*50=100


def test_caps_never_exceed_full_width():
    caps = derive_retry_capacities([700, 710, 720], 1000, 3)
    assert caps == (1.0, 0.6, 0.58)


def test_single_tier_always_full():
    assert derive_retry_capacities([100], 100, 1) == (1.0,)


def test_run_with_retry_semantics():
    """One retry on transient failures; degenerate-timing refusals stay fatal
    (retrying those would launder a corrupt measurement into a number)."""
    import pytest

    from bench import run_with_retry
    from ikflow_tpu.utils.profiling import DegenerateTimingError

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("response body closed")  # observed tunnel blip
        return 0

    assert run_with_retry(flaky) == 0
    assert calls["n"] == 2

    def always_broken():
        raise RuntimeError("still broken")

    with pytest.raises(RuntimeError, match="still broken"):
        run_with_retry(always_broken)  # second failure propagates

    def degenerate():
        raise DegenerateTimingError("timing noise floor")

    with pytest.raises(DegenerateTimingError):
        run_with_retry(degenerate)  # no retry: must stay a refusal
