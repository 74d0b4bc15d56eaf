"""Join-family custom operators Spark lacks natively.

as-of join: the classic implementations are (a) a range cross-join +
filter (quadratic blowup) or (b) per-group `pd.merge_asof` via
applyInPandas (Python in the hot path). This one is pure Spark: tag the
two inputs, UNION them, and carry the right side's latest values forward
with a last_value window ordered by the time key — one shuffle on the
`by` keys, linear work, whole-stage codegen throughout.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_join(
    left: SDF,
    right: SDF,
    on: str,
    by: _ty.Optional[_ty.List[str]] = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> SDF:
    """For each left row, attach the right row with the greatest `on` <=
    left.`on` (direction='backward'; 'forward' mirrors it), matching on
    the optional `by` equality keys. Right value columns are appended
    with `suffix`."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    by = by or []
    l_cols = left.columns
    r_vals = [c for c in right.columns if c != on and c not in by]

    tagged_l = left.select(
        *[F.col(c) for c in l_cols],
        F.lit(1).alias("__is_left__"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in r_vals],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in by or c == on else F.lit(None).cast(t).alias(c)
            for c, t in [(c, dict(left.dtypes).get(c, "string")) for c in l_cols]
        ],
        F.lit(0).alias("__is_left__"),
        *[F.col(c).alias(f"{c}{suffix}") for c in r_vals],
    )
    both = tagged_l.unionByName(tagged_r)

    if direction == "backward":
        # right rows sort before left rows at the same timestamp, so a
        # left row matches a right row with an equal `on` value
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("__is_left__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    out = both
    for c in r_vals:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
        )
    return out.filter(F.col("__is_left__") == 1).drop("__is_left__")


def salted_join(
    left: SDF,
    right: SDF,
    on: _ty.List[str],
    how: str = "inner",
    salt: int = 16,
) -> SDF:
    """Skew-mitigating equi-join: append a uniform random salt in
    [0, salt) to each LEFT row and replicate each RIGHT row across all
    salt values, then join on (keys + salt) — a hot key's rows spread
    over `salt` reducers instead of one. Semantically identical to
    left.join(right, on, how) for inner/left joins (each left row still
    meets every matching right row exactly once).

    AQE's skew-join splitting (enabled in our sessions) handles most
    skew after a shuffle boundary; use this when a known-degenerate key
    distribution (e.g. 30% null-bucket or one mega-customer) must be
    spread deterministically, at the documented cost of a `salt`-times
    replication of the right side — so keep the smaller side right."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how}")
    l2 = left.withColumn("__salt__", (F.rand() * salt).cast("int"))
    r2 = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l2.join(r2, list(on) + ["__salt__"], how).drop("__salt__")


def interval_join(
    left: SDF,
    right: SDF,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: _ty.Optional[_ty.List[str]] = None,
    bucket_seconds: _ty.Optional[float] = None,
    how: str = "inner",
    suffix: str = "_right",
) -> SDF:
    """Join each left row to every right interval that contains it:
    ``right_start <= left_ts < right_end`` (plus optional ``by``
    equality keys).

    The naive formulation — an inequality join — degenerates in Spark
    to BroadcastNestedLoopJoin / cartesian + filter, O(|L|*|R|) at any
    scale.  This operator is the bucketized form every streaming engine
    uses for interval joins: time is cut into fixed buckets of
    ``bucket_seconds``; each interval is exploded to the buckets it
    overlaps, each left row lands in exactly ONE bucket, and the join
    becomes a hash equi-join on (by..., bucket) followed by the exact
    containment filter.  Because the left side joins on a single
    bucket, each qualifying (left, right) pair is produced exactly once
    — no dedup pass.  With the default bucket width (the max interval
    length, one tiny agg job) every interval spans <= 2 buckets, so the
    exploded right side is <= 2x its input and the whole join is one
    shuffle, no quadratic step.  Pass ``bucket_seconds`` explicitly to
    skip the sizing job (and for streaming parity).

    ``how='left'`` keeps unmatched left rows with nulls on the right.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how}")
    by = by or []

    def _secs(df: SDF, c: str) -> F.Column:
        # epoch seconds as double for any temporal or numeric time column
        if dict(df.dtypes)[c].startswith("timestamp"):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    if bucket_seconds is None:
        row = right.agg(
            F.max(_secs(right, right_end) - _secs(right, right_start))
        ).first()
        bucket_seconds = float(row[0] or 1.0)
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    w = float(bucket_seconds)

    l_cols = list(left.columns)
    renames = {
        c: f"{c}{suffix}" if c in l_cols else c
        for c in right.columns
        if c not in by
    }
    r = right.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(n) for c, n in renames.items()],
    )
    r_start, r_end = renames[right_start], renames[right_end]

    lb = left.withColumn("__bucket__", F.floor(_secs(left, left_ts) / F.lit(w)))
    rb = r.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor(_secs(r, r_start) / F.lit(w)),
                F.floor(_secs(r, r_end) / F.lit(w)),
            )
        ),
    )
    cond = (F.col(left_ts) >= F.col(r_start)) & (F.col(left_ts) < F.col(r_end))
    matched = lb.join(rb, by + ["__bucket__"], "inner").where(cond).drop("__bucket__")
    if how == "inner":
        return matched
    # left outer: append left rows with NO containing interval (anti-join
    # on the FULL condition — a bucket-only anti would drop rows whose
    # candidates merely failed the containment filter)
    full_cond = lb["__bucket__"] == rb["__bucket__"]
    for k in by:
        full_cond = full_cond & (lb[k] == rb[k])
    full_cond = full_cond & (lb[left_ts] >= rb[r_start]) & (lb[left_ts] < rb[r_end])
    r_out = [c for c in matched.columns if c not in lb.columns]
    unmatched = (
        lb.join(rb, full_cond, "left_anti")
        .drop("__bucket__")
        .select("*", *[F.lit(None).cast(dict(matched.dtypes)[c]).alias(c) for c in r_out])
    )
    return matched.unionByName(unmatched)


def checked_join(
    left: SDF,
    right: SDF,
    on: _ty.List[str],
    expect: str = "m:1",
    how: str = "inner",
) -> SDF:
    """Equi-join with a cardinality CONTRACT: ``expect='m:1'`` asserts
    the right side is unique on the join keys, ``'1:1'`` asserts both
    sides are — the classic silent-fanout bug (a dup-keyed dimension
    quietly multiplying fact rows and every downstream aggregate)
    becomes a loud failure at execution time instead of a wrong number
    in a report.

    Scale design: uniqueness is checked with a count window over the
    join key on the side(s) under contract — the same partitioning the
    join itself needs, so the check rides the existing exchange (no
    second pass over either input); the violation fires Spark's
    ``raise_error`` inside the first task that meets a duplicate, at
    any scale."""
    if expect not in ("m:1", "1:1"):
        raise ValueError("expect must be 'm:1' or '1:1'")
    from pyspark.sql import Window

    def _guard(side: SDF, name: str) -> SDF:
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*on))
        msg = F.concat(
            F.lit(f"checked_join: {name} side has duplicate join key ("),
            F.concat_ws(
                ", ", *[F.col(k).cast("string") for k in on]
            ),
            F.lit(f") under a {expect} contract"),
        )
        # the guard must live in a FILTER: a guard column that nothing
        # reads is pruned by the optimizer and the check silently
        # disappears; assert_true returns NULL when satisfied, so the
        # filter keeps every row and cannot be optimized away
        return (
            side.withColumn("__ck__", cnt)
            .where(F.assert_true(F.col("__ck__") <= 1, msg).isNull())
            .drop("__ck__")
        )

    r = _guard(right, "right")
    l = _guard(left, "left") if expect == "1:1" else left
    return l.join(r, on, how)
