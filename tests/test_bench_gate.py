"""Bench regression-gate logic (pure functions, no Spark session)."""

from bench import WALL_NOISE_FLOOR_SEC, wall_regression


def test_under_bar_never_regresses():
    assert not wall_regression(1.0, 1.0, byte_clean=True)
    assert not wall_regression(1.24, 1.0, byte_clean=False)


def test_subsecond_noise_suppressed_when_bytes_clean():
    # BENCH_r05's phantom: 0.31s wall on a 0.187s normalized bar
    # (1.29x) with an empty byte gate — must NOT be reported
    assert not wall_regression(0.31, 0.187, byte_clean=True)
    assert 0.31 - 0.187 < WALL_NOISE_FLOOR_SEC


def test_subsecond_excess_still_flagged_when_bytes_dirty():
    assert wall_regression(0.31, 0.187, byte_clean=False)


def test_large_excess_flagged_regardless_of_bytes():
    # a real 2x on a multi-second query exceeds the noise floor
    assert wall_regression(8.0, 4.0, byte_clean=True)
    assert wall_regression(8.0, 4.0, byte_clean=False)


def test_floor_is_absolute_not_relative():
    # 1.3x on a tiny bar but absolute delta under the floor: suppressed
    assert not wall_regression(0.13, 0.1, byte_clean=True)
    # same ratio on a big bar: delta 3s >> floor, flagged
    assert wall_regression(13.0, 10.0, byte_clean=True)


def test_median_drift_empty_and_odd():
    from bench import median_drift

    assert median_drift([]) == 1.0
    assert median_drift([1.3, 1.28, 1.35, 0.9, 1.31]) == 1.3


def test_drift_adjust_uniform_inflation_vanishes():
    # BENCH_r06 first run: ten unrelated byte-clean queries at
    # 1.26-1.68x with machine_factor 1.13 — uniform host inflation.
    # Entries within 25% of the median drift are absorbed; genuine
    # outliers survive, re-normalized.
    from bench import drift_adjust

    raw = {"q102": 1.29, "q23": 1.32, "q43": 1.33, "q45": 1.68}
    adj = drift_adjust(raw, 1.31)
    assert "q102" not in adj and "q23" not in adj and "q43" not in adj
    assert adj == {"q45": 1.28}


def test_drift_adjust_no_drift_keeps_raw():
    from bench import drift_adjust

    # drift at/below 1.0 never weakens the raw gate
    assert drift_adjust({"q1": 1.3}, 1.0) == {"q1": 1.3}
    assert drift_adjust({"q1": 1.3}, 0.8) == {"q1": 1.3}
