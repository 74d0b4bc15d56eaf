"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
  * every stage is a narrow projection or one hash-shuffle on a
    uniformly-distributed hash key — no skew, no driver round-trips;
  * candidate generation (LSH bands / shared shingles) bounds the pair
    space so the quadratic step only touches near-duplicates;
  * all hashing is md5-based (JVM built-in, whole-stage codegen) so an
    external SQL oracle can reproduce results bit-for-bit.

All functions take and return plain pyspark DataFrames, so they compose
with the facade (`DataFrame.to_spark()`) and raw Spark pipelines alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F


def _norm_text(col):
    """Normalization used before hashing: lowercase + collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


# ---------------------------------------------------------------------------
# Exact dedup


def exact_dedup_ids(df: SDF, text_col: str = "text", id_col: str = "doc_id") -> SDF:
    """One surviving id per distinct (normalized) text: group on a 48-bit
    content hash + the text itself (hash alone could collide), keep min id.
    Single shuffle; map-side partial aggregation applies."""
    norm = _norm_text(F.col(text_col))
    h = F.conv(F.substring(F.md5(norm), 1, 12), 16, 10).cast("long")
    return (
        df.select(F.col(id_col), norm.alias("__norm__"), h.alias("content_hash"))
        .groupBy("content_hash", "__norm__")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, "content_hash", "dup_count")
    )


def exact_dedup(df: SDF, text_col: str = "text", id_col: str = "doc_id") -> SDF:
    """Full surviving rows (all columns) after exact dedup, keep-min-id."""
    keep = exact_dedup_ids(df, text_col, id_col).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH


def _shingles(df: SDF, text_col: str, id_col: str, k: int) -> SDF:
    """Distinct k-word shingles per doc, one row per (doc, shingle) —
    array-built in codegen, exploded only where a join needs rows."""
    return df.select(
        F.col(id_col), F.explode(_shingle_array(text_col, k)).alias("shingle")
    )


def _shingle_array(text_col: str, k: int):
    """Distinct k-word shingles of one document as an array expression."""
    words = F.split(_norm_text(F.col(text_col)), " ")
    n = F.size(words)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    )


def minhash_signatures(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 8,
) -> SDF:
    """Per-doc MinHash signature: hash h_s(x) = md5(s || '|' || shingle);
    the signature element for seed s is the lexicographic min hex digest.

    Implementation note (measured at sf0.1): one explode over (doc,
    shingle) + a single groupBy(doc) computing all num_hashes mins as
    separate aggregates. The md5s run in whole-stage codegen (nested
    higher-order lambdas would be interpreted, ~5x slower), and the
    min-aggregates combine map-side, so the one shuffle carries only
    docs × num_hashes × 32 bytes — negligible at any scale. Docs with no
    shingles (< k words) are dropped. Returns (id, sig: array<string>)."""
    sh = _shingles(df, text_col, id_col, shingle_k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"__mh{s}__")
        for s in range(num_hashes)
    ]
    per_doc = sh.groupBy(id_col).agg(*aggs)
    return per_doc.select(
        F.col(id_col),
        F.array(*[F.col(f"__mh{s}__") for s in range(num_hashes)]).alias("sig"),
    )


def minhash_pairs(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> SDF:
    """Candidate near-duplicate pairs via LSH banding: split the signature
    into `bands` rows-per-band chunks; docs sharing any band key become a
    pair. The self-join is on band_key — a uniformly distributed hash —
    so it shuffles evenly and never goes quadratic in the corpus size."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, shingle_k, num_hashes)
    banded = sig.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("sig"),
    ).select(
        id_col,
        "band",
        F.array_join(F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band), "|").alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash(df: SDF, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> SDF:
    """SimHash over word tokens. Bit j of a token's hash is the top bit of
    hex nibble j of md5(token) (bits <= 32); the doc's simhash sets bit j
    iff the sum over tokens of (+-1) votes is positive.

    Entirely higher-order functions over a per-row token-hash array —
    zero shuffles (an explode+groupBy formulation would shuffle every
    token of the corpus)."""
    assert bits <= 32
    hashes = F.transform(F.split(_norm_text(F.col(text_col)), " "), F.md5)

    def vote(j: int):
        return F.aggregate(
            F.col("__h__"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int") >= 8, 1).otherwise(-1),
        )

    sim = None
    for j in range(bits):
        bit = F.when(vote(j) > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return df.select(F.col(id_col), hashes.alias("__h__")).select(
        id_col, sim.alias("simhash")
    )


def simhash_groups(df: SDF, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> SDF:
    """Docs sharing an identical simhash bucket (near-dup clusters)."""
    s = simhash(df, text_col, id_col, bits)
    return (
        s.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("rep_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard


def ngram_jaccard_pairs(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> SDF:
    """Exact Jaccard similarity over distinct k-shingles, computed
    join-first: |A ∩ B| falls out of a self-join on shingle + pair count;
    |A ∪ B| = |A| + |B| − |A ∩ B|. Only docs sharing ≥1 shingle are ever
    paired, and the shingle join key is high-cardinality text → even
    shuffle. No per-row set materialization."""
    sh = _shingles(df, text_col, id_col, shingle_k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
