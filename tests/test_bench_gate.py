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
