"""Beyond-parity operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star): exact
and near deduplication, similarity search, text analysis, and multimodal
column plumbing — all designed partition-first for the 100 TB target:
no driver-side materialization, no cross joins except against broadcast
sides, every grouping keyed on a hash-distributed column.
"""

from .dedup import (
    connected_components,
    contamination,
    duplicate_spans,
    strip_duplicate_spans,
    exact_dedup,
    exact_dedup_ids,
    minhash_pairs,
    minhash_signatures,
    near_dedup,
    near_dup_clusters,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    simhash,
    simhash_groups,
    simhash_pairs,
)
from .clustering import kmeans, kmeans_assign
from .joins import asof_join, interval_join, salted_join
from .preprocess import (
    binned_cdf,
    binned_quantile,
    hash_sample,
    hash_split,
    mix_proportions,
    scaled_frame,
    split_column,
    stratified_sample,
    weighted_sample,
    winsorize,
)
from .multimodal import attach_media, decode_features, frame_sample_plan, resize_media
from .relevance import (
    bm25_scores,
    build_vocab,
    collocations,
    term_frequencies,
    tf_idf,
    top_terms,
)
from .similarity import (
    brute_force_topk,
    cosine_pairs,
    group_centroids,
    ivf_topk,
    lsh_topk,
    normalize_embeddings,
)
from .sequence import funnel, resample_ffill, retention_cohorts
from .stats import corr_matrix, histogram, take_per_group
from .sketch import (
    cms_lookup,
    heavy_hitters,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_registers,
)
from .textstats import (
    chunk_documents,
    dedup_lines,
    doc_fingerprint,
    redact_pii,
    repetition_stats,
    language_id,
    quality_score,
    text_stats,
    token_count,
)

__all__ = [
    "asof_join",
    "binned_cdf",
    "binned_quantile",
    "heavy_hitters",
    "winsorize",
    "attach_media",
    "salted_join",
    "brute_force_topk",
    "group_centroids",
    "normalize_embeddings",
    "decode_features",
    "frame_sample_plan",
    "simhash",
    "cosine_pairs",
    "chunk_documents",
    "dedup_lines",
    "doc_fingerprint",
    "collocations",
    "corr_matrix",
    "histogram",
    "take_per_group",
    "cms_lookup",
    "cms_sketch",
    "funnel",
    "resample_ffill",
    "retention_cohorts",
    "hll_distinct",
    "hll_estimate",
    "hll_registers",
    "contamination",
    "duplicate_spans",
    "strip_duplicate_spans",
    "exact_dedup",
    "exact_dedup_ids",
    "language_id",
    "ivf_topk",
    "kmeans",
    "kmeans_assign",
    "lsh_topk",
    "connected_components",
    "minhash_pairs",
    "minhash_signatures",
    "near_dedup",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "hash_sample",
    "interval_join",
    "hash_split",
    "mix_proportions",
    "stratified_sample",
    "weighted_sample",
    "quality_score",
    "resize_media",
    "scaled_frame",
    "split_column",
    "simhash_groups",
    "simhash_pairs",
    "redact_pii",
    "repetition_stats",
    "text_stats",
    "token_count",
    "bm25_scores",
    "build_vocab",
    "term_frequencies",
    "tf_idf",
    "top_terms",
]
