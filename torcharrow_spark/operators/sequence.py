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

__all__ = ["funnel", "retention_cohorts"]


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
