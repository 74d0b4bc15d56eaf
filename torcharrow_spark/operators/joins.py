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
