"""Frame-level ML preprocessing at cluster scale.

`functional.scale_to_0_1` / `scale_to_z_score` (reference
functional.py:568-596) are column-level and use a whole-frame window —
fine single-node, a single-partition bottleneck on a cluster. These
variants compute the frame statistics with one aggregate (exact decimal
sums → deterministic doubles) and broadcast the 1-row result back, so
scaling stays embarrassingly parallel.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F


def scaled_frame(
    df: SDF,
    columns: _ty.List[str],
    method: str = "z",
    decimals: int = 2,
) -> SDF:
    """Append `{col}_scaled` for each column. method='z': (x-mean)/std_pop;
    method='minmax': (x-min)/(max-min). Mean/std derive from exact
    DECIMAL sums, so results are identical under any partitioning."""
    aggs = []
    for c in columns:
        # 18 digits: dec*dec stays within the 38-digit cap on every engine
        dec = F.col(c).cast(f"decimal(18,{decimals})")
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.sum(dec).cast("double").alias(f"__s_{c}"),
            F.sum(dec * dec).cast("double").alias(f"__q_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in columns:
        n = F.col(f"__n_{c}")
        mean = F.col(f"__s_{c}") / n
        var = F.col(f"__q_{c}") / n - mean * mean
        sd = F.sqrt(var)
        x = F.col(c).cast("double")
        if method == "z":
            scaled = F.when(sd > 0, (x - mean) / sd).otherwise(F.lit(0.0))
        elif method == "minmax":
            rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
            scaled = F.when(rng > 0, (x - F.col(f"__mn_{c}")) / rng).otherwise(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-x))
            )
        else:
            raise ValueError(method)
        out = out.withColumn(f"{c}_scaled", scaled)
    drop = [col for c in columns for col in
            (f"__n_{c}", f"__s_{c}", f"__q_{c}", f"__mn_{c}", f"__mx_{c}")]
    return out.drop(*drop)
