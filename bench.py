"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully executed (collect-to-count via a no-op sink) so the
timing covers scan + shuffle + result materialization, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_join_topk",
    "q05_dedup_keep_first",
    "q11_window_rank",
    "q12_cumsum",
    "q16_event_windows",
    "q17_sessionize",
    "q18_exact_dedup",
    "q19_minhash_pairs",
    "q21_ngram_jaccard",
    "q22_ann_brute_force",
    "q23_ann_lsh",
    "q24_text_stats",
    "q27_rec_ops",
    "q37_asof_join",
    "q41_bpe_tokenize",
    "q42_cosine_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import torcharrow_spark as ts
    from torcharrow_spark.queries import QUERIES

    spark = ts.get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the queries
    QUERIES["q01_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
