"""Capture .explain("formatted") for headline queries into
plans/<round>/<query>_<tag>.txt — the judge checks plan claims against these
files (the judge cannot run Spark).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag: 'before' / 'after'
  default query set: every HEADLINE entry in bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import torcharrow_spark as ts
    from bench import HEADLINE, HEADLINE_OVERRIDES
    from torcharrow_spark.queries import QUERIES

    spark = ts.get_session("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    names = names or HEADLINE
    for name in names:
        qfn = HEADLINE_OVERRIDES.get(name, QUERIES[name])
        try:
            df = qfn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - capture the failure itself
            plan = f"EXPLAIN FAILED: {e}\n"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)}B, Exchange x{n_ex} -> {path}")


if __name__ == "__main__":
    main()
