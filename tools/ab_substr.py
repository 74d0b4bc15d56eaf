"""Same-session A/B: cross_doc_spans / strip_cross_doc_spans current
(anchor-gram pipeline computed twice: distinct-count side + join-back
side) vs repartition-shared (grams exchanged ONCE on the hash halves;
the distinct, the count, and the join all consume that one exchange —
guide §2.4).  Asserts identical output before timing.

Usage: python tools/ab_substr.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def spans_shared(df, k=30, text_col="text", id_col="doc_id"):
    from torcharrow_spark.operators.substring import _anchor_grams

    grams = _anchor_grams(df, k, text_col, id_col).repartition(
        "__h1__", "__h2__"
    )
    shared = (
        grams.select("__h1__", "__h2__", F.col(id_col))
        .distinct()
        .groupBy("__h1__", "__h2__")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )
    marked = grams.join(shared, ["__h1__", "__h2__"]).select(
        F.col(id_col), "pos", "n_docs"
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = marked.withColumn("__grp__", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy(id_col, "__grp__")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + k).cast("long").alias("span_len"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.max("n_docs").cast("long").alias("max_docs"),
        )
        .select(id_col, "span_start", "span_len", "n_grams", "max_docs")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import torcharrow_spark as ts
    from bench import (
        CAL_ANCHOR_SEC,
        StageMetrics,
        _sink,
        measure_calibration,
    )
    from torcharrow_spark.operators.substring import cross_doc_spans

    spark = ts.get_session("ab-substr")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    metrics = StageMetrics(spark)

    variants = {
        "current": lambda: cross_doc_spans(docs, k=30),
        "shared": lambda: spans_shared(docs, k=30),
    }
    base = sorted(map(tuple, variants["current"]().collect()))
    got = sorted(map(tuple, variants["shared"]().collect()))
    print(f"identity shared: {'OK' if got == base else 'MISMATCH'} "
          f"({len(base)} rows)")
    if got != base:
        sys.exit(1)

    for build in variants.values():
        _sink(build())
    results: dict[str, list[float]] = {k: [] for k in variants}
    bytes_: dict[str, int] = {}
    for rep in range(reps):
        cal = measure_calibration(spark, n=2)
        print(f"# probe rep{rep}: cpu {cal / CAL_ANCHOR_SEC:.2f}x")
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
