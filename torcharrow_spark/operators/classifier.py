"""Distributed trainable quality classifier: logistic regression by
full-batch gradient descent over feature columns — the LEARNED
complement to the heuristic Gopher gate (`textstats.gopher_filter`).
Production corpus curation trains exactly this shape of model
("quality = P(looks like the reference corpus)") on cheap per-document
features and scores every document with it.

100 TB design (same playbook as `operators/clustering.kmeans`):
- Scoring is a per-row projection over broadcast WEIGHT LITERALS —
  zero shuffle, whole-stage codegen, no UDF.
- Each training iteration is ONE scan + one (dim+1)-column aggregate
  with map-side partial combine: every executor contributes dim
  partial sums (bytes), so shuffle volume is independent of row count.
- Gradient contributions are rounded half-up to 8 decimals per row and
  summed as exact DECIMAL(28,8): `exp` differs by 1 ulp across
  engines/libms, so the rounding pins the per-row value and the exact
  decimal sum makes the TRAINED WEIGHTS bit-identical regardless of
  partitioning, AQE decisions, or engine — the float-determinism
  policy of queries.py applied to model fitting (an unrounded float
  sum would make the model depend on reduce order).
- Weights live on the driver as dim floats (bytes, never data);
  iterations are a Python loop like Lloyd's in `kmeans`.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F

__all__ = ["logreg_train", "logreg_score"]

# the engine-determinism rounding primitives live in ONE place
from .relevance import _round6, _round8  # noqa: E402


def _margin(feature_cols: _ty.Sequence[str], w: _ty.Sequence[float]) -> F.Column:
    """w·x as a left-associated chain — the same addition order an
    external SQL replay writes, so the double result is bit-identical."""
    z = F.col(feature_cols[0]).cast("double") * F.lit(float(w[0]))
    for c, wi in zip(feature_cols[1:], list(w)[1:]):
        z = z + F.col(c).cast("double") * F.lit(float(wi))
    return z


def logreg_train(
    df: SDF,
    feature_cols: _ty.Sequence[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 3,
    cache: bool = True,
) -> _ty.List[float]:
    """Fit logistic-regression weights (one per feature column; include
    a constant column for the bias) by ``iters`` full-batch gradient
    steps from w = 0:

        p   = sigmoid(w·x)
        g_i = mean over rows of round8((p - y) * x_i)
        w_i <- w_i - lr * g_i

    Full-batch (not SGD) is the deliberate scale choice: one scan per
    step, a dim-sized shuffle, and a bit-deterministic fit — corpus
    quality models are small (a handful of features), so a few exact
    batch steps beat a stochastic pass that would make the model depend
    on row order. Rows with a NULL feature or label are EXCLUDED
    up front (a NULL would drop out of the decimal gradient sums while
    still inflating the mean's denominator — silently shrinking every
    gradient); an empty or fully-null training frame raises.
    Returns plain Python floats."""
    cols = list(feature_cols)
    feat = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols],
        F.col(label_col).cast("double").alias("__y__"),
    ).na.drop()
    if cache:
        feat = feat.persist()
    try:
        w = [0.0] * len(cols)
        for _ in range(iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(cols, w)))
            err = p - F.col("__y__")
            row = feat.agg(
                F.count(F.lit(1)).alias("__n__"),
                *[
                    F.sum(
                        _round8(err * F.col(c)).cast("decimal(28,8)")
                    ).alias(f"__g{i}__")
                    for i, c in enumerate(cols)
                ],
            ).collect()[0]
            n = float(row["__n__"])
            if n == 0:
                raise ValueError(
                    "logreg_train: no trainable rows (empty input, or "
                    "every row has a NULL feature/label)"
                )
            w = [
                wi - lr * (float(row[f"__g{i}__"]) / n)
                for i, wi in enumerate(w)
            ]
        return w
    finally:
        if cache:
            feat.unpersist()


def logreg_score(
    df: SDF,
    feature_cols: _ty.Sequence[str],
    weights: _ty.Sequence[float],
    out_col: str = "score",
    round6: bool = True,
) -> SDF:
    """Score every row with a trained model: adds ``out_col`` =
    sigmoid(w·x), rounded half-up to 6 decimals by default (cross-engine
    `exp` ulp policy — same as BM25 scores). Zero-shuffle projection."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(list(feature_cols), weights)))
    if round6:
        p = _round6(p)
    return df.withColumn(out_col, p)
