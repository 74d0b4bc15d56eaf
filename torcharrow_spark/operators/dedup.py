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
    h = F.conv(F.substring(F.md5(_norm_text(F.col(text_col))), 1, 12), 16, 10).cast("long")
    return (
        df.select(F.col(id_col), F.col(text_col), h.alias("content_hash"))
        .groupBy("content_hash", text_col)
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
    """Distinct k-word shingles per doc. posexplode over the split words,
    then a slice-join — stays in codegen, no UDFs."""
    words = F.split(_norm_text(F.col(text_col)), " ")
    n = F.size(words)
    # shingle i = words[i..i+k-1], 0 <= i <= n-k
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
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
    One shuffle (groupBy doc). Returns (id, sig: array<string>)."""
    sh = _shingles(df, text_col, id_col, shingle_k)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    hashed = sh.select(
        id_col,
        F.explode(seeds).alias("seed"),
        F.col("shingle"),
    ).select(
        id_col,
        "seed",
        F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))).alias("h"),
    )
    per_seed = hashed.groupBy(id_col, "seed").agg(F.min("h").alias("minh"))
    return (
        per_seed.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("seed", "minh"))).alias("sm"))
        .select(id_col, F.transform("sm", lambda x: x["minh"]).alias("sig"))
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
    iff the sum over tokens of (+-1) votes is positive. Pure expressions,
    one groupBy-free aggregation via explode + groupBy(id)."""
    assert bits <= 32
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("tok"),
    ).select(id_col, F.md5("tok").alias("h"))
    votes = [
        F.sum(
            F.when(
                F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int") >= 8, 1
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return agg.select(id_col, sim.alias("simhash"))


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
