"""Same-session A/B: connected_components current (the symmetric edge
list — and therefore the caller's whole pair pipeline when it isn't
checkpointed — re-executes in EVERY iteration's joins) vs an
edge-checkpointed variant (one lazy localCheckpoint of `sym` before the
loop; iterations read executor-local blocks — guide §5 'caching is
worth it when a DataFrame is reused and recomputing it is more
expensive').  Timed on q166's actual sub-use (minhash pairs over the
sf0.1 documents) and on near_dup_clusters end-to-end.

Usage: python tools/ab_cc.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def cc_ckpt(edges, id_a="id_a", id_b="id_b", max_iter=25):
    sym = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nmin = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(nmin, labels["id"] == nmin["src"], "left").select(
            labels["id"],
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        parents = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        jumped = (
            stepped.join(parents, stepped["label"] == parents["pid"], "left")
            .select(
                stepped["id"],
                F.coalesce(F.col("plabel"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("component"))


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
    from torcharrow_spark.operators.dedup import (
        connected_components,
        minhash_pairs,
    )

    spark = ts.get_session("ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    metrics = StageMetrics(spark)

    def pairs():
        return minhash_pairs(docs, shingle_k=3, num_hashes=8, bands=4)

    variants = {
        "current": lambda: connected_components(pairs()),
        "ckpt": lambda: cc_ckpt(pairs()),
    }
    base = sorted(map(tuple, variants["current"]().collect()))
    got = sorted(map(tuple, variants["ckpt"]().collect()))
    print(f"identity ckpt: {'OK' if got == base else 'MISMATCH'} "
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
