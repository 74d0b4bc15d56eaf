"""Ordered event-sequence analytics over event logs: funnel analysis.

Scale design: the whole funnel is ONE hash-shuffle on ``user_col``.
Each step's first-reachable time is a ``min(when(...))`` window over
the same ``partitionBy(user_col)`` — Catalyst stacks the Window
operators over a single Exchange — and the per-user collapse
(``groupBy(user_col)``) reuses that partitioning, so adding funnel
steps adds zero shuffles.  The final per-step frame is K rows (K =
number of steps) produced by posexplode of one aggregated row — bytes.

Timestamps are compared as epoch microseconds (exact integers) so the
strict "later than previous step" comparisons are engine-representation
independent (the q17 lesson).
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["funnel", "retention_cohorts", "resample_ffill"]


def retention_cohorts(
    df: SDF,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> SDF:
    """Weekly cohort-retention matrix: users are cohorted by the ISO
    week (Monday-start, both engines' ``date_trunc`` convention) of
    their first event; each cell counts the cohort's users active in
    week ``cohort_week + week_offset``.

    Plan: one shuffle on ``user_col`` for the first-event window, a
    narrow dedup of (user, offset) pairs, then one shuffle on the
    (cohort, offset) cell key — cells are O(weeks^2) rows regardless of
    corpus size.  Output: ``cohort_week`` ('yyyy-MM-dd' string, engine-
    representation-proof), ``week_offset`` (int), ``n_active`` (long
    distinct users)."""
    w = Window.partitionBy(user_col)
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    base = df.select(F.col(user_col), wk.alias("__wk__"))
    with_cohort = base.withColumn("__cohort__", F.min("__wk__").over(w))
    cells = (
        with_cohort.select(
            user_col,
            "__cohort__",
            (F.datediff(F.col("__wk__"), F.col("__cohort__")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
        .groupBy("__cohort__", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.select(
        F.date_format("__cohort__", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
    )


def funnel(
    df: SDF,
    steps: _ty.Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> SDF:
    """Classic ordered funnel: a user reaches step *i* if an event of
    type ``steps[i]`` occurs strictly after the earliest time they
    reached step *i-1* (first-touch attribution, the standard product-
    analytics semantics).

    Returns one row per step: ``step_index`` (1-based), ``step``,
    ``users_reached`` and ``conversion`` (fraction of the previous
    step's users; 1.0 for the first step, 0.0 when the previous step
    had no users)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    t = F.expr(f"unix_micros(cast(`{ts_col}` as timestamp))")
    cur = df.select(user_col, F.col(type_col).alias("__type__"), t.alias("__t__"))
    prev: str | None = None
    names = []
    for i, step in enumerate(steps, 1):
        cond = F.col("__type__") == step
        if prev is not None:
            cond = cond & (F.col("__t__") > F.col(prev))
        name = f"__s{i}__"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col("__t__"))).over(w))
        prev = name
        names.append(name)
    per_user = cur.groupBy(user_col).agg(
        *[F.max(n).alias(n.strip("_")) for n in names]
    )
    counts = per_user.agg(
        *[
            F.count(n.strip("_")).cast("long").alias(f"n{i}")
            for i, n in enumerate(names, 1)
        ]
    )
    arr = F.array(*[F.col(f"n{i}") for i in range(1, len(steps) + 1)])
    labels = F.array(*[F.lit(s) for s in steps])
    prev_n = F.element_at(F.col("__arr__"), F.col("pos"))
    exploded = counts.select(arr.alias("__arr__"), labels.alias("__lab__")).select(
        "__arr__",
        "__lab__",
        F.posexplode("__arr__").alias("pos", "users_reached"),
    )
    conversion = (
        F.when(F.col("pos") == 0, F.lit(1.0))
        .when(prev_n == 0, F.lit(0.0))
        .otherwise(
            F.col("users_reached").cast("double") / prev_n.cast("double")
        )
    )
    return exploded.select(
        (F.col("pos") + 1).cast("int").alias("step_index"),
        F.element_at(F.col("__lab__"), F.col("pos") + 1).alias("step"),
        F.col("users_reached").cast("long").alias("users_reached"),
        conversion.alias("conversion"),
    )


def resample_ffill(
    df: SDF,
    key_col: str,
    ts_col: str,
    val_col: str,
    interval_s: int,
    id_col: str | None = None,
) -> SDF:
    """Resample an irregular per-key time series onto a fixed
    ``interval_s``-second grid, forward-filling the last observed
    value (the standard feature-engineering step before any
    fixed-step model input).

    Scale design: per-key bounds come from one HashAggregate; the
    grid materializes as ``sequence()`` + ``explode`` (pure codegen,
    fan-out = span/interval per key, never a cross join against a
    global calendar); observations and grid points union and a single
    ``last(value, ignorenulls)`` window per key carries values
    forward — ONE shuffle on the key, sort confined to each key's
    partition.  No driver collection anywhere.

    Determinism: grid timestamps are exact integer arithmetic on
    epoch seconds (``k * interval_s`` for ``ceil(min/i) <= k <=
    floor(max/i)``), values pass through untouched, and ties (several
    observations at one timestamp) break on ``id_col`` — so output is
    identical under any partitioning and engine.

    Returns ``(key, ts_s, value)`` with ``ts_s`` the grid point as an
    epoch-seconds BIGINT (representation-proof output, the q17
    lesson).
    """
    us = F.expr(f"unix_micros(cast(`{ts_col}` as timestamp))")
    obs = df.select(
        F.col(key_col).alias("__k__"),
        us.alias("__us__"),
        F.col(val_col).cast("double").alias("__v__"),
        (F.col(id_col) if id_col else F.lit(0)).alias("__tie__"),
        F.lit(0).alias("__grid__"),
    )
    i_us = int(interval_s) * 1_000_000
    bounds = obs.groupBy("__k__").agg(
        F.min("__us__").alias("__mn__"), F.max("__us__").alias("__mx__")
    )
    grid = bounds.select(
        "__k__",
        F.explode(
            F.sequence(
                # integer ceil/floor division on epoch micros — exact on
                # any engine (epochs are positive; no double rounding)
                F.expr(f"(__mn__ + {i_us - 1}) DIV {i_us}"),
                F.expr(f"__mx__ DIV {i_us}"),
            )
        ).alias("__kidx__"),
    ).select(
        "__k__",
        (F.col("__kidx__") * F.lit(i_us)).alias("__us__"),
        F.lit(None).cast("double").alias("__v__"),
        F.lit(None).cast("long").alias("__tie__"),
        F.lit(1).alias("__grid__"),
    )
    w = (
        Window.partitionBy("__k__")
        .orderBy("__us__", "__grid__", "__tie__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        obs.unionByName(grid)
        .withColumn("__ff__", F.last("__v__", ignorenulls=True).over(w))
        .where(F.col("__grid__") == 1)
        .select(
            F.col("__k__").alias(key_col),
            (F.col("__us__") / F.lit(1_000_000)).cast("long").alias("ts_s"),
            F.col("__ff__").alias("value"),
        )
    )
