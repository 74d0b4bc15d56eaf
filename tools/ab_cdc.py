"""Same-session A/B: cdc_dedup_stats current (double chunker pass) vs
repartition-shared (one exchange of instance rows feeding both the
doc-frequency aggregate and the join — guide §2.4 'two operations keyed
the same way can share one exchange') vs lazy-localCheckpoint variant.

Interleaved samples with CPU+python probes bracketing; asserts the
variants' outputs are IDENTICAL (collected and compared) before timing.

Usage: python tools/ab_cdc.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def variant_shared(df, text_col="text", id_col="doc_id"):
    from torcharrow_spark.operators.cdc import cdc_chunks

    inst = cdc_chunks(df, text_col, id_col).repartition("h")
    freq = inst.groupBy("h").agg(F.countDistinct(id_col).alias("ndocs"))
    shared = F.col("ndocs") > 1
    return (
        inst.join(freq, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(shared, 1).otherwise(0)).alias("n_shared_chunks"),
            F.sum(F.when(shared, F.col("ln")).otherwise(0)).alias("shared_bytes"),
            F.sum("ln").alias("total_bytes"),
        )
    )


def variant_plain(df, text_col="text", id_col="doc_id"):
    """The pre-r12 shape: no lineage cut, the (vectorized) chunker
    runs once per consumer subtree."""
    from torcharrow_spark.operators.cdc import cdc_chunks

    inst = cdc_chunks(df, text_col, id_col)
    freq = inst.groupBy("h").agg(F.countDistinct(id_col).alias("ndocs"))
    shared = F.col("ndocs") > 1
    return (
        inst.join(freq, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(shared, 1).otherwise(0)).alias("n_shared_chunks"),
            F.sum(F.when(shared, F.col("ln")).otherwise(0)).alias("shared_bytes"),
            F.sum("ln").alias("total_bytes"),
        )
    )


def variant_ckpt(df, text_col="text", id_col="doc_id"):
    from torcharrow_spark.operators.cdc import cdc_chunks

    inst = cdc_chunks(df, text_col, id_col).localCheckpoint(eager=False)
    freq = inst.groupBy("h").agg(F.countDistinct(id_col).alias("ndocs"))
    shared = F.col("ndocs") > 1
    return (
        inst.join(freq, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(shared, 1).otherwise(0)).alias("n_shared_chunks"),
            F.sum(F.when(shared, F.col("ln")).otherwise(0)).alias("shared_bytes"),
            F.sum("ln").alias("total_bytes"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import torcharrow_spark as ts
    from bench import (
        CAL_ANCHOR_SEC,
        PYTHON_CAL_ANCHOR_SEC,
        StageMetrics,
        _sink,
        measure_calibration,
        measure_python_calibration,
    )
    from torcharrow_spark.operators.cdc import cdc_dedup_stats

    spark = ts.get_session("ab-cdc")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    metrics = StageMetrics(spark)

    variants = {
        "current": lambda: cdc_dedup_stats(docs),
        "plain": lambda: variant_plain(docs),
        "shared": lambda: variant_shared(docs),
        "ckpt": lambda: variant_ckpt(docs),
    }

    # output identity first
    base = sorted(map(tuple, variants["current"]().collect()))
    for name in ("plain", "shared", "ckpt"):
        got = sorted(map(tuple, variants[name]().collect()))
        print(f"identity {name}: {'OK' if got == base else 'MISMATCH'}")
        if got != base:
            sys.exit(1)

    for name, build in variants.items():
        _sink(build())  # cold
    results: dict[str, list[float]] = {k: [] for k in variants}
    bytes_: dict[str, int] = {}
    for rep in range(reps):
        cal = measure_calibration(spark, n=2)
        pcal = measure_python_calibration(spark, n=2)
        print(
            f"# probes rep{rep}: cpu {cal / CAL_ANCHOR_SEC:.2f}x "
            f"python {pcal / PYTHON_CAL_ANCHOR_SEC:.2f}x"
        )
        for name, build in variants.items():
            wm = metrics.snapshot()
            t0 = time.perf_counter()
            _sink(build())
            sec = time.perf_counter() - t0
            results[name].append(round(sec, 3))
            b = metrics.since(wm)
            bytes_[name] = b["shuffle_write"]
            print(f"  {name}: {sec:.3f}s shuffle {b['shuffle_write']}B "
                  f"spill {b['spill']}B")
    for name, secs in results.items():
        print(f"{name}: best {min(secs):.3f}s samples {secs} "
              f"shuffle {bytes_[name]}B")


if __name__ == "__main__":
    main()
