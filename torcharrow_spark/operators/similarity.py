"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the (huge) corpus; per-row dot products run inside
whole-stage codegen via zip_with/aggregate, and top-k per query is a
bounded window. Scale path: random-hyperplane LSH bucketing so each query
only scans its bucket — hyperplane weights are md5-derived, so fully
deterministic and oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    d = _dot(a, b)
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: SDF,
    queries: SDF,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> SDF:
    """Exact cosine top-k: broadcast the query set against the corpus.
    Cost is |corpus| × |queries| dot products, all JVM-side; the per-query
    top-k window is bounded by k so no full sort materializes."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def _hyperplane_sign(vec, plane: int) -> F.Column:
    """Sign bit of <v, w_plane> where w_plane[d] is a deterministic
    pseudo-random weight in [-7.5, 7.5]: the value of hex nibble
    (d mod 12)+1 of md5('plane,d') minus 7.5. Oracle-reproducible."""
    n = F.size(vec)
    idx = F.sequence(F.lit(0), n - 1)
    terms = F.transform(
        idx,
        lambda d: (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{plane},"), d.cast("string"))), 1, 1),
                16,
                10,
            ).cast("double")
            - F.lit(7.5)
        )
        * F.element_at(vec, d + 1).cast("double"),
    )
    proj = F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec, n_planes: int = 4) -> F.Column:
    """Random-hyperplane LSH bucket id in [0, 2^n_planes)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + _hyperplane_sign(vec, p) * F.lit(2 ** p)
    return bucket.cast("int")


def lsh_topk(
    corpus: SDF,
    queries: SDF,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> SDF:
    """Approximate top-k: bucket corpus and queries by hyperplane signs,
    join on bucket (equi-join → hash shuffle, 2^n_planes× less work than
    brute force), then per-query top-k within the bucket. Recall can be
    raised by multi-probe (querying neighboring buckets) — not needed at
    this corpus size."""
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
        )
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def cosine_pairs(
    corpus: SDF,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> SDF:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed self-join, then
    exact cosine filter. The quadratic step is confined to each bucket."""
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(b, "bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
