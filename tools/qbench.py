"""Single-query micro-bench matching bench.py's methodology exactly
(noop sink, cold + steady runs, per-query shuffle/spill bytes from the
status store, CPU probe bracketing) — so a change can be measured
without the full bench run.

Usage: python tools/qbench.py q138_kmeans_semantic_dedup [q43_... ...]
       [--reps N] (default 3 steady reps, min reported)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import torcharrow_spark as ts
    from bench import (
        CAL_ANCHOR_SEC,
        HEADLINE_OVERRIDES,
        StageMetrics,
        _sink,
        measure_calibration,
    )
    from torcharrow_spark.queries import QUERIES

    spark = ts.get_session("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    _sink(QUERIES["q01_pricing_summary"](spark, sf_dir))  # warm the JVM
    metrics = StageMetrics(spark)

    cal = measure_calibration(spark, n=2)
    print(f"# probe before: {cal:.3f}s (factor {cal / CAL_ANCHOR_SEC:.2f}x)")
    for name in args:
        qfn = HEADLINE_OVERRIDES.get(name, QUERIES[name])
        spark.sparkContext.setJobDescription(f"qbench:{name}:cold")
        t0 = time.perf_counter()
        _sink(qfn(spark, sf_dir))
        cold = time.perf_counter() - t0
        best, bytes_ = float("inf"), None
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qbench:{name}:steady{r}")
            wm = metrics.snapshot()
            t0 = time.perf_counter()
            _sink(qfn(spark, sf_dir))
            sec = time.perf_counter() - t0
            if bytes_ is None:
                bytes_ = metrics.since(wm)
            best = min(best, sec)
        print(
            f"{name}: cold {cold:.3f}s steady(best-of-{reps}) {best:.3f}s "
            f"shuffle {bytes_['shuffle_write']}B spill {bytes_['spill']}B"
        )
    cal = measure_calibration(spark, n=2)
    print(f"# probe after: {cal:.3f}s (factor {cal / CAL_ANCHOR_SEC:.2f}x)")


if __name__ == "__main__":
    main()
