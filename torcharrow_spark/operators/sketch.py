"""Cardinality sketches: deterministic HyperLogLog over md5-derived
hashes (Flajolet et al. 2007, public algorithm).

Why not ``approx_count_distinct``: Spark's built-in HLL++ is fast but
its register layout is engine-private — no external oracle can reproduce
the estimate, and two engines disagree.  This implementation derives
every register from ``md5(value)`` with pure integer/bit arithmetic, so
ANY engine (DuckDB, Trino, ...) computes the bit-identical estimate —
the property the repo's correctness gate is built on.

Scale design (the whole point of a sketch at 100 TB):
  * one hash-shuffle on ``(group, bucket)`` where bucket has at most
    ``2**p`` values — Spark's HashAggregate computes the per-register
    ``max`` map-side first (max is associative), so only ``m = 2**p``
    tiny rows per group ever cross the wire regardless of input size;
  * the estimate step reduces those ``m`` rows per group — bytes;
  * no floating-point accumulation: the harmonic sum is computed as an
    exact integer sum of ``2**(SUFFIX_BITS+1-rho)`` (register values are
    bounded so it cannot overflow a BIGINT), and only the final
    alpha*m^2/sum division is double arithmetic (same literal operand
    order on every engine -> bit-identical IEEE result).

Reference capability anchor: torcharrow exposes approximate aggregates
through its velox functional namespace (functional.pyi: approx_distinct);
this is the Spark-first, oracle-reproducible equivalent.
"""

from __future__ import annotations

import functools
import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_estimate", "hll_distinct",
           "cms_sketch", "cms_lookup", "heavy_hitters", "grouped_heavy_hitters", "bloom_build", "bloom_probe"]

# 15 hex digits of md5 -> 60-bit non-negative hash (16 digits would
# overflow a signed long through conv; see operators/dedup.py).
_HASH_BITS = 60


def _hash60(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: SDF,
    value_col: str,
    group_cols: _ty.Sequence[str] = (),
    p: int = 8,
) -> SDF:
    """HLL register frame: one row per (group, bucket) holding the
    register value ``m_j = max(rho)`` where ``rho`` is 1 + the number of
    leading zeros in the hash suffix.  Registers are mergeable by
    ``max`` — union two corpora's register frames and re-aggregate to
    sketch the union without rescanning either (the streaming /
    incremental property sketches exist for)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    suffix_bits = _HASH_BITS - p
    h = _hash60(F.col(value_col))
    bucket = F.shiftright(h, suffix_bits)
    suffix = h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), suffix_bits) - 1)
    # bit length of suffix via the base-2 string (no leading zeros);
    # rho = leading_zeros + 1 = suffix_bits - bitlen + 1; suffix == 0
    # means all suffix_bits are zero -> rho = suffix_bits + 1.
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(suffix))
    )
    keys = [F.col(c) for c in group_cols]
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("m_j"))
    )


def linear_counting_table(p: int) -> _ty.List[float]:
    """``m * ln(m / V)`` for ``V = 1..m`` (1-indexed), precomputed in
    Python.  Embedded as a literal array in BOTH engines' plans because
    JVM ``Math.log`` and libm ``ln`` disagree by 1 ulp on ~7% of inputs
    (measured) — neither engine may compute ``ln`` itself if the
    estimates must be bit-identical.  ``V`` has only ``2**p`` possible
    values, so the table is tiny (p=8 -> 256 doubles)."""
    import math

    m = 1 << p
    return [m * math.log(m / v) for v in range(1, m + 1)]


def hll_estimate(
    regs: SDF,
    group_cols: _ty.Sequence[str] = (),
    p: int = 8,
) -> SDF:
    """Estimate from a register frame (``hll_registers`` output, or any
    max-merged union of register frames — the incremental/streaming
    path): linear counting ``m*ln(m/V)`` (precomputed table) when empty
    registers exist and the raw estimate is <= 2.5m, else the raw
    harmonic-mean estimator.  Typical relative error ~1.04/sqrt(2**p).
    No large-range correction: the 60-bit hash space makes hash
    collisions negligible at any corpus size (the 32-bit correction in
    the original paper exists only because 2^32 saturates).

    Output: group_cols..., ``est_distinct`` (double), ``registers_used``
    (long, the number of non-empty registers, a free fill-rate
    diagnostic)."""
    m = 1 << p
    suffix_bits = _HASH_BITS - p
    # exact integer harmonic sum: sum(2^-m_j) scaled by 2^suffix_bits;
    # empty registers (m - count) contribute 2^-0 = 1 -> 2^suffix_bits
    # each.  Max total = m * 2^suffix_bits = 2^60 < 2^63: no overflow.
    # pyspark's shiftleft only takes a literal shift -> SQL expr form
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {suffix_bits} - m_j)")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(scaled).alias("__present__"),
        F.count(F.lit(1)).alias("registers_used"),
    )
    total = F.col("__present__") + (
        F.lit(m) - F.col("registers_used")
    ) * F.lit(1 << suffix_bits).cast("long")
    raw = (
        F.lit(alpha * m * m * float(1 << suffix_bits)) / total.cast("double")
    )
    empties = F.lit(m) - F.col("registers_used")
    # greatest(...,1) keeps the index valid when empties==0 (branch not
    # taken, but no element_at(.., 0) may appear even unevaluated)
    # ONE F.expr over generated SQL text, not 2^p F.lit py4j round
    # trips (~0.75 s of driver-side Python per construction at p=8 —
    # guide §5.4, the r12 kmeans-centroid pattern). repr() is the
    # shortest round-tripping decimal and Spark's string->double cast
    # is correctly rounded, so each parsed literal is the identical
    # IEEE double the Column-API form embedded (pinned by
    # test_hll_lc_table_sql_expr_matches_column_api).
    lc_tab = F.expr(
        "array("
        + ",".join(
            f"CAST('{x!r}' AS DOUBLE)" for x in linear_counting_table(p)
        )
        + ")"
    )
    lc = F.element_at(lc_tab, F.greatest(empties, F.lit(1)).cast("int"))
    est = F.when((empties > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    keys = [F.col(c) for c in group_cols]
    return agg.select(
        *keys,
        est.alias("est_distinct"),
        F.col("registers_used").cast("long").alias("registers_used"),
    )


def hll_distinct(
    df: SDF,
    value_col: str,
    group_cols: _ty.Sequence[str] = (),
    p: int = 8,
) -> SDF:
    """Per-group HyperLogLog distinct-count estimate over raw data:
    ``hll_estimate(hll_registers(df))``.  See both for the design."""
    return hll_estimate(hll_registers(df, value_col, group_cols, p),
                        group_cols, p)


def _cms_bucket(seed_col: F.Column, value_col: F.Column, w: int) -> F.Column:
    """Row ``seed``'s bucket for ``value``: md5-derived 60-bit hash of
    ``"seed|value"`` mod ``w`` — non-negative on every engine."""
    return _hash60(F.concat(seed_col.cast("string"), F.lit("|"),
                            value_col.cast("string"))) % w


def cms_sketch(df: SDF, value_col: str, d: int = 4, w: int = 256) -> SDF:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public
    algorithm): a ``d x w`` counter matrix where row *i* adds each
    occurrence of ``value`` to bucket ``hash_i(value) mod w``.

    Scale design: one explode (x``d``, narrow) then one hash-shuffle on
    ``(seed, bucket)`` with at most ``d*w`` groups — Spark's partial
    aggregation collapses each partition to <= d*w rows map-side, so
    shuffle volume is bounded by the sketch size times partitions, not
    the data.  Sketches merge by adding cell counts (union two frames,
    re-sum) — the streaming/incremental property.  Returns
    (``seed``, ``bucket``, ``cnt``); empty cells are implicit zeros."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 hash rows and w >= 2 buckets")
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    exploded = df.select(F.col(value_col).alias("__v__")).select("__v__", seeds)
    return (
        exploded.select(
            "seed", _cms_bucket(F.col("seed"), F.col("__v__"), w).alias("bucket")
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_lookup(
    sketch: SDF, probes: SDF, value_col: str, d: int = 4, w: int = 256
) -> SDF:
    """Point-query the sketch for each distinct probe value: the
    estimate is ``min`` over the ``d`` rows' cells (always >= the true
    count; over-estimation bounded by ``e * N / w`` with probability
    ``1 - e^-d``).  The sketch side is tiny (<= d*w rows) so the join
    broadcasts — probing N values is one narrow pass over the probes."""
    pv = probes.select(F.col(value_col).alias("__v__")).distinct()
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    keyed = pv.select("__v__", seeds).select(
        "__v__", "seed",
        _cms_bucket(F.col("seed"), F.col("__v__"), w).alias("bucket"),
    )
    joined = keyed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    return (
        joined.groupBy("__v__")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .select(F.col("__v__").alias(value_col),
                F.col("est_count").cast("long").alias("est_count"))
    )


def heavy_hitters(
    df: SDF, value_col: str, threshold: float
) -> SDF:
    """Exact frequency-threshold heavy hitters (all values occurring in
    at least ``threshold`` fraction of rows) in two linear passes —
    never a full-cardinality shuffle.

    Scale design: a plain ``groupBy(value).count()`` shuffles one row
    per DISTINCT value — at 100 TB of e.g. corpus tokens that is
    billions of groups for a result of a few hundred.  Instead:

      pass 1 (candidate generation, zero shuffle): each partition
        counts its own values in a hash map (Arrow-batched
        ``mapInPandas``) and emits only values that are locally heavy
        (local count >= threshold * local rows).  Pigeonhole: a value
        with global frequency >= t*N must reach >= t*N_p in at least
        one partition, so the union of local candidates is a SUPERSET
        of the true answer — and it is tiny (<= 1/t per partition).
      pass 2 (exact verify): facts semi-join the broadcast candidate
        set, then one bounded ``groupBy().count()`` over candidates
        only; a 1-row total-count aggregate cross-joins in and the
        final filter ``cnt >= t * N`` is exact.

    The output is therefore EXACT (candidates are only pruned, never
    invented), deterministic under any partitioning, and the only
    Python in the pipeline is the per-partition counter — a single
    linear scan with bounded memory (the counter can be swept with a
    Misra-Gries eviction if per-partition cardinality is itself huge;
    at 1/t candidates retained the guarantee is identical).

    Reference capability anchor: torcharrow's functional namespace
    exposes approx_most_frequent (functional.pyi); this is the
    Spark-first exact-verified equivalent.

    Returns ``(value, cnt, frac)`` with ``frac = cnt / N`` (double,
    same single division on any engine).  NULL is a reportable value
    like any other (it counts toward N, so it must be reportable
    against the threshold it inflates — same null contract as
    :func:`grouped_heavy_hitters`).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    vals = df.select(F.col(value_col).cast("string").alias("value"))

    def _local_heavy(batches):
        import pandas as pd

        counts: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for v, c in pdf["value"].value_counts(dropna=False).items():
                key = None if v != v else v
                counts[key] = counts.get(key, 0) + int(c)
        cand = [v for v, c in counts.items() if c >= threshold * n]
        yield pd.DataFrame({"value": pd.Series(cand, dtype="object")})

    candidates = vals.mapInPandas(_local_heavy, "value string").distinct()
    total = vals.agg(F.count(F.lit(1)).alias("__total__"))
    return (
        vals.alias("v")
        .join(
            F.broadcast(candidates.alias("c")),
            F.col("v.value").eqNullSafe(F.col("c.value")),
            "left_semi",
        )
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(threshold) * F.col("__total__"))
        .select(
            "value",
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total__")).alias("frac"),
        )
    )


def grouped_heavy_hitters(
    df: SDF,
    value_col: str,
    threshold: float,
    by: _ty.Sequence[str],
) -> SDF:
    """Per-group exact heavy hitters: all values covering at least
    ``threshold`` of THEIR GROUP's rows (per-language top tokens,
    per-source boilerplate, ...).  Same two-pass design as
    :func:`heavy_hitters` — the pigeonhole argument holds group-wise
    (a value with group frequency >= t*N_g must be locally heavy
    within that group's rows of some partition), so per-partition
    counting emits a per-group candidate superset, and one bounded
    aggregate over candidates + a per-group total join make the final
    filter exact.  Returns ``(*by, value, cnt, frac)`` with the group
    keys in their ORIGINAL types; NULL group keys form a group like
    any other, and NULL is a reportable VALUE like any other (joins are
    null-safe end-to-end — plain equality on the value would silently
    drop a NULL value that crosses the threshold while its rows still
    inflate the group total it is measured against; advisor finding
    r3)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    keys = list(by)
    if not keys:
        raise ValueError("use heavy_hitters() for the ungrouped form")
    # string shadow keys feed the pandas candidate pass (stable Arrow
    # schema regardless of key types); original keys ride along for the
    # exact phase and the output
    shadows = [f"__k{i}__" for i in range(len(keys))]
    vals = df.select(
        *keys,
        *[F.col(k).cast("string").alias(s) for k, s in zip(keys, shadows)],
        F.col(value_col).cast("string").alias("value"),
    )
    out_schema = ", ".join([f"`{s}` string" for s in shadows] + ["value string"])

    def _local_heavy(batches):
        import pandas as pd

        counts: dict = {}
        totals: dict = {}
        for pdf in batches:
            gv = pdf.groupby(shadows, dropna=False, sort=False)
            for g, sub in gv:
                gt = g if isinstance(g, tuple) else (g,)
                totals[gt] = totals.get(gt, 0) + len(sub)
                for v, c in sub["value"].value_counts(dropna=False).items():
                    # normalize NaN -> None at insert: NaN != NaN would
                    # split one null value across several dict entries
                    key = (gt, None if v != v else v)
                    counts[key] = counts.get(key, 0) + int(c)
        rows = [
            (*gt, v)
            for (gt, v), c in counts.items()
            if c >= threshold * totals[gt]
        ]
        # pandas groupby surfaces NULL keys as NaN — normalize back
        rows = [tuple(None if x != x else x for x in r) for r in rows]
        yield pd.DataFrame(rows, columns=shadows + ["value"], dtype="object")

    candidates = (
        vals.select(*shadows, "value").mapInPandas(_local_heavy, out_schema)
        .distinct()
        .alias("c")
    )
    v = vals.alias("v")
    semi_cond = [
        F.col(f"v.{s}").eqNullSafe(F.col(f"c.{s}")) for s in shadows
    ] + [F.col("v.value").eqNullSafe(F.col("c.value"))]
    survivors = v.join(
        F.broadcast(candidates),
        functools.reduce(lambda a, b: a & b, semi_cond),
        "left_semi",
    )
    counts = survivors.groupBy(*keys, F.col("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = vals.groupBy(*keys).agg(F.count(F.lit(1)).alias("__total__"))
    tot_cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"n.{k}").eqNullSafe(F.col(f"t.{k}")) for k in keys],
    )
    return (
        counts.alias("n")
        .join(totals.alias("t"), tot_cond)
        .where(F.col("cnt") >= F.lit(threshold) * F.col("__total__"))
        .select(
            *[F.col(f"n.{k}").alias(k) for k in keys],
            F.col("n.value").alias("value"),
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total__")).alias("frac"),
        )
    )


def _bloom_pos(i: int, col: F.Column, m_bits: int) -> F.Column:
    """Bit position i for a value: md5-derived 60-bit hash mod m_bits —
    the same arithmetic any SQL engine reproduces."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}|"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(m_bits),
    )


def bloom_build(df: SDF, col: str, m_bits: int = 8192, k: int = 3) -> SDF:
    """Build a Bloom filter over a key column as a (word, bits) table —
    the manual runtime-filter primitive: build on the SMALL side's
    keys, broadcast (<= m_bits/32 rows), and pre-filter a huge fact
    scan with :func:`bloom_probe` BEFORE any shuffle, so non-matching
    fact rows never leave their input partition.

    Determinism/portability: positions are md5-derived (mod m_bits)
    and words hold 32 bits each in a BIGINT (masks stay positive —
    no engine-specific signed-shift edge), aggregated with BIT_OR
    (associative; map-side combine bounds the shuffle at m_bits/32
    rows per partition).  An external SQL engine reproduces the
    filter bit-for-bit.  False-positive rate ~ (1-e^{-kn/m})^k;
    size m_bits ~ 10-15 bits per expected distinct key for ~1% FP."""
    if m_bits % 32 != 0:
        raise ValueError("m_bits must be a multiple of 32")
    if k < 1:
        raise ValueError("k must be >= 1")
    c = F.col(col)
    rows = df.where(c.isNotNull()).select(
        F.explode(
            F.array(*[_bloom_pos(i, c, m_bits) for i in range(k)])
        ).alias("pos")
    )
    return (
        rows.select(
            (F.col("pos") / 32).cast("long").alias("word"),
            # 2^b as an exact double->long (b <= 31; F.shiftleft only
            # takes literal shift counts)
            F.pow(F.lit(2.0), (F.col("pos") % 32).cast("int"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: SDF, col: str, bloom: SDF, m_bits: int = 8192, k: int = 3,
    out_col: str = "might_match",
) -> SDF:
    """Append a ``might_match`` flag: False means the key is DEFINITELY
    absent from the built key set; True means probably present (FP
    rate as sized).  The filter collapses to ONE broadcast map row and
    the probe is a zero-shuffle projection (k map lookups + bit tests
    per row) — chain ``.where(F.col('might_match'))`` in front of the
    real join and the shuffle only carries surviving rows.  Null keys
    probe False."""
    packed = bloom.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("__bloom__")
    )
    c = F.col(col)
    checks = []
    for i in range(k):
        pos = _bloom_pos(i, c, m_bits)
        word = (pos / 32).cast("long")
        mask = F.pow(F.lit(2.0), (pos % 32).cast("int")).cast("long")
        checks.append(
            F.coalesce(
                F.element_at(F.col("__bloom__"), word), F.lit(0).cast("long")
            ).bitwiseAND(mask)
            != 0
        )
    hit = checks[0]
    for ch in checks[1:]:
        hit = hit & ch
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn(out_col, F.when(c.isNotNull(), hit).otherwise(F.lit(False)))
        .drop("__bloom__")
    )
