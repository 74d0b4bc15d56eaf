"""Distributed descriptive statistics: pairwise Pearson correlation,
fixed-width histograms, per-group exact-k sampling.

Float-parity design (SURVEY §7.4): every accumulation is an exact
DECIMAL sum (order-independent), and the only floating-point steps are
single divisions/multiplications/sqrt on those exact operands — all
IEEE-754 correctly-rounded operations (sqrt is, ``ln`` is not), so two
engines produce bit-identical results regardless of partitioning.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["corr_matrix", "grouped_histogram", "histogram", "profile_frame", "take_per_group"]


def corr_matrix(df: SDF, cols: _ty.Sequence[str], scale: int = 2) -> SDF:
    """Pairwise Pearson correlation in long format (``col_a``,
    ``col_b``, ``corr``), one row per unordered pair a < b.

    One single pass: ALL C(k,2) pairs' moment sums (n, Sx, Sy, Sxy,
    Sxx, Syy) ride one global HashAggregate — map-side partials reduce
    each partition to a single row, so shuffle volume is k^2 numbers
    per partition, independent of row count.  Inputs are fixed to
    ``scale`` decimal digits (cast DECIMAL(18,scale)) so products and
    sums are exact integers in disguise; corr is then a pure
    IEEE-arithmetic expression over the exact moments.  Rows where
    either column is NULL are excluded per-pair (pandas semantics)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    dec = f"decimal(18,{scale})"
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            tag = f"{a}__{b}"
            pairs.append((a, b, tag))
            x = F.when(
                F.col(a).isNotNull() & F.col(b).isNotNull(), F.col(a)
            ).cast(dec)
            y = F.when(
                F.col(a).isNotNull() & F.col(b).isNotNull(), F.col(b)
            ).cast(dec)
            aggs += [
                F.count(x).cast("long").alias(f"n_{tag}"),
                F.sum(x).alias(f"sx_{tag}"),
                F.sum(y).alias(f"sy_{tag}"),
                F.sum(x * y).alias(f"sxy_{tag}"),
                F.sum(x * x).alias(f"sxx_{tag}"),
                F.sum(y * y).alias(f"syy_{tag}"),
            ]
    m = df.agg(*aggs)
    rows = []
    for a, b, tag in pairs:
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        denom = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        corr = F.when(denom == 0, F.lit(None).cast("double")).otherwise(
            (n * sxy - sx * sy) / denom
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr.alias("corr"),
                F.col(f"n_{tag}").alias("n"),
            )
        )
    return m.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def histogram(
    df: SDF,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> SDF:
    """Fixed-width histogram over [lo, hi): bin i covers
    ``lo + i*(hi-lo)/n_bins``; values outside clamp into the edge bins
    (bin 0 / bin n_bins-1), NULLs are dropped.  Empty bins are emitted
    with count 0 (plot-ready).  One HashAggregate over at most
    ``n_bins`` groups; the bin-id expression is the same IEEE
    arithmetic on every engine."""
    if not hi > lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - lo) / width).cast("int")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    counts = (
        df.where(F.col(col).isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        bins.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias(
                "bin_lo"
            ),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def take_per_group(
    df: SDF,
    group_cols: _ty.Sequence[str],
    k: int,
    id_col: str,
    seed: int = 0,
) -> SDF:
    """Deterministic exact-k sample per group: rank rows inside each
    group by md5(seed|id) (a uniform, engine-reproducible order) and
    keep the first k.  One shuffle on the group key; the window is
    bounded per group.  Ties are impossible while ids are unique per
    group (hash of distinct strings)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    order = F.md5(
        F.concat(F.lit(str(seed)), F.lit("|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*group_cols).orderBy(order.asc(), F.col(id_col))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def profile_frame(
    df: SDF, cols: _ty.Sequence[str] | None = None, decimals: int = 2
) -> SDF:
    """One-pass per-column dataset profile ("dataset card"): row count,
    null count, distinct count, and numeric min/max/mean — the
    pre-training sanity sweep over a new table.

    Scale design: columns MELT into long format first (one narrow
    posexplode-style projection, n_cols x rows, zero shuffle) so ONE
    grouped aggregate computes every column's stats — versus one job
    per column, or a single wide aggregate whose COUNT(DISTINCT)s
    expand the input once per column.  Distinct counting goes through
    the string rendering of each value (injective for round-trip
    formats, so the count is representation-independent); the mean is
    an exact DECIMAL sum over numerics divided once.  For
    billion-distinct columns swap the exact distinct for
    ``sketch.hll_distinct`` — this profile is the exact form.

    Returns one row per column: ``(column, n_rows, n_null,
    n_distinct, min_val, max_val, mean_val)`` (numeric stats null for
    non-numeric columns)."""
    from pyspark.sql import types as T

    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(cols) if cols else list(fields)
    num_types = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    # decimal(38,·): the widest Spark decimal — integer parts up to
    # 38-decimals digits sum exactly (partition-invariant); anything
    # wider nulls out per-value and is SURFACED as a null mean below,
    # never silently skipped (decimal(18,·) dropped >16-digit values
    # from the sum while the denominator still counted them)
    dec = f"decimal(38,{decimals})"
    melted = []
    for c in cols:
        if c not in fields:
            raise ValueError(f"unknown column {c!r}")
        is_num = isinstance(fields[c], num_types)
        nval = F.col(c).cast("double") if is_num else F.lit(None).cast("double")
        dval = F.col(c).cast(dec) if is_num else F.lit(None).cast(dec)
        melted.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("sval"),
                F.col(c).isNull().cast("int").alias("is_null"),
                nval.alias("nval"),
                dval.alias("dval"),
            )
        )
    long_ = df.select(F.explode(F.array(*melted)).alias("m")).select("m.*")
    return long_.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_null").cast("long").alias("n_null"),
        F.count_distinct("sval").alias("n_distinct"),
        F.min("nval").alias("min_val"),
        F.max("nval").alias("max_val"),
        F.when(
            F.count("dval") == F.count("nval"),
            F.sum("dval").cast("double") / F.count("nval"),
        ).alias("mean_val"),
    )


def grouped_histogram(
    df: SDF,
    col: str,
    by: _ty.Sequence[str],
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> SDF:
    """Per-group fixed-width histogram (one distribution per group
    value — the faceted-plot / drift-monitoring query).  Same bin
    semantics as :func:`histogram`; ONE HashAggregate bounded at
    groups x n_bins rows, and the empty-bin fill is a (distinct
    groups) x n_bins cross join of two tiny frames — never a pass
    over the data.  Returns ``(*by, bin, bin_lo, n)``."""
    if not hi > lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    keys = list(by)
    if not keys:
        raise ValueError("use histogram() for the ungrouped form")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - lo) / width).cast("int")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(*keys, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    groups = df.select(*keys).distinct()
    return (
        groups.crossJoin(F.broadcast(bins))
        .join(counts, keys + ["bin"], "left")
        .select(
            *keys,
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias(
                "bin_lo"
            ),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )
