"""Content-defined chunking (CDC) dedup: alignment-robust chunk-level
sharing across documents.

Fixed-size chunking misses duplicates the moment one byte is inserted
upstream (every later block shifts). Content-defined chunking cuts where
a rolling hash of the last ``window`` characters hits a residue class,
so boundaries travel WITH the content — two documents sharing a long
run of text produce identical interior chunks no matter where the run
sits. This is the storage-dedup classic (LBFS/FastCDC lineage) applied
to corpus curation: it complements the span-level (token n-gram) and
line-level dedup in ``operators/dedup`` with a tokenizer-free byte/char
level signal.

The rolling hash is a plain degree-``window`` polynomial in 31 over
character codepoints — position-local (no state across cuts), which is
what makes chunking embarrassingly parallel AND lets an external SQL
oracle replay boundaries exactly. ``min_size``/``max_size`` add the
practical guards real deployments use (they make boundaries stateful;
leave both unset for the oracle-replayable pure form).

Scale design: chunking is per-row map work (zero shuffle); sharing is
one groupBy on the chunk's md5 (a 128-bit uniform key — chunk TEXT
never rides the shuffle, per the engine-wide rule) followed by a
hash-to-hash join back. Both exchanges key on md5, so skew is
impossible by construction; at 100 TB the only knob that matters is
``avg_size`` (the modulus), which divides instance count linearly.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE = 31

#: rolling-hash window (chars) and cut modulus (expected chunk length).
#: Published in torcharrow_spark.tuning; the oracle for q157 replays
#: these exact values, so changing them means re-deriving that SQL.
DEFAULT_WINDOW = 4
DEFAULT_MODULUS = 16


def chunk_boundaries(
    codes: _ty.Sequence[int],
    window: int = DEFAULT_WINDOW,
    modulus: int = DEFAULT_MODULUS,
    min_size: _ty.Optional[int] = None,
    max_size: _ty.Optional[int] = None,
) -> _ty.List[int]:
    """Cut positions (1-indexed, exclusive ends) for one document.
    A cut lands after position ``i`` (``i >= window``) when the
    polynomial hash of codes[i-window..i) is ``0 (mod modulus)``; the
    final position is always a boundary. ``min_size`` suppresses cuts
    that would make a chunk shorter than it; ``max_size`` forces one."""
    n = len(codes)
    top = _BASE ** window
    cuts: _ty.List[int] = []
    last = 0
    h = 0
    for i in range(1, n + 1):
        h = h * _BASE + codes[i - 1]
        if i > window:
            h -= codes[i - window - 1] * top
        content_cut = i >= window and h % modulus == 0
        if min_size is not None and (i - last) < min_size:
            content_cut = False
        if max_size is not None and (i - last) >= max_size:
            content_cut = True
        if content_cut:
            cuts.append(i)
            last = i
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def _chunk_cuts_stateless(
    text: str, window: int, modulus: int
) -> _ty.List[int]:
    """Vectorized cut positions for the STATELESS form (no min/max
    guards — boundaries are a pure position-local function, so the
    whole document's rolling hashes are one windowed dot product).
    Exact integer arithmetic via per-term modular reduction: every
    addend is ``(code % modulus) * (31^(window-1-k) mod modulus)`` —
    strictly under ``modulus**2`` — and the accumulator is reduced each
    step, so values stay inside int64 for any ``modulus < 2^31`` no
    matter how large ``window`` is. The reference loop checks
    ``h % modulus == 0`` on the exact polynomial and ``h`` is never
    negative, so the residues agree bit-for-bit (pinned in tests,
    including non-power-of-two moduli and windows past 31^w int64
    range). r12, guide §4.2: the per-character Python loop was the
    chunker's whole cost; a few vectorized ops per document replace
    ~5 interpreted ops per character. r13: the original unreduced form
    wrapped mod 2^64 on window >= 14 (numpy overflow) and silently
    diverged for non-power-of-two moduli; modular reduction removes
    both failure modes."""
    import numpy as np

    if modulus >= 1 << 31:
        # modulus**2 could exceed int64; the exact loop covers this
        raise OverflowError("modulus too large for the int64 fast path")
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    n = int(codes.size)
    cuts: _ty.List[int] = []
    if n >= window:
        m = n - window + 1  # windows ending at positions window..n
        codes64 = codes.astype(np.int64)
        codes64 %= modulus  # one pass; every term is now < modulus**2
        acc = np.zeros(m, dtype=np.int64)
        if window * (modulus - 1) ** 2 < (1 << 63):
            # sum of <= window unreduced terms provably fits int64:
            # defer the reduction to one final pass (default 4x16 path
            # costs the same ops as the r12 unreduced form)
            for k in range(window):
                acc += codes64[k : k + m] * pow(
                    _BASE, window - 1 - k, modulus
                )
            acc %= modulus
        else:
            for k in range(window):
                acc = (
                    acc
                    + codes64[k : k + m]
                    * pow(_BASE, window - 1 - k, modulus)
                ) % modulus
        cuts = (np.nonzero(acc == 0)[0] + window).tolist()
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def chunk_text(
    text: str,
    window: int = DEFAULT_WINDOW,
    modulus: int = DEFAULT_MODULUS,
    min_size: _ty.Optional[int] = None,
    max_size: _ty.Optional[int] = None,
) -> _ty.List[str]:
    """Split ``text`` into content-defined chunks (codepoint domain, so
    the same text chunks identically regardless of encoding)."""
    if min_size is None and max_size is None:
        try:
            cuts = _chunk_cuts_stateless(text, window, modulus)
        except (ImportError, UnicodeEncodeError, OverflowError):
            # numpy absent, a lone surrogate utf-32 can't encode, or a
            # modulus too large for the int64 fast path: the exact
            # per-character loop still covers every input
            codes = [ord(c) for c in text]
            cuts = chunk_boundaries(codes, window, modulus)
    else:
        codes = [ord(c) for c in text]
        cuts = chunk_boundaries(codes, window, modulus, min_size, max_size)
    out = []
    prev = 0
    for cut in cuts:
        out.append(text[prev:cut])
        prev = cut
    return out


def cdc_chunks(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = DEFAULT_WINDOW,
    modulus: int = DEFAULT_MODULUS,
    min_size: _ty.Optional[int] = None,
    max_size: _ty.Optional[int] = None,
) -> SDF:
    """One row per chunk instance: ``(id, seq, h, ln)`` where ``h`` is
    the md5 of the chunk's UTF-8 bytes and ``ln`` the length of those
    SAME bytes — hash and size measure one encoding, so the
    shared-bytes fractions downstream are true byte fractions even on
    multibyte corpora (boundaries are still cut in the codepoint
    domain, so identical text chunks identically regardless of the
    source encoding). The chunk text itself is dropped before anything
    shuffles."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, False),
            T.StructField("seq", T.IntegerType(), True),
            T.StructField("h", T.StringType(), True),
            T.StructField("ln", T.LongType(), True),
        ]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    src = spread_narrow_source(df.select(id_col, text_col))

    def chunk_iter(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, seqs, hs, lns = [], [], [], []
            for i, s in zip(pdf[id_col], pdf[text_col]):
                if s is None:
                    continue
                for k, chunk in enumerate(
                    chunk_text(s, window, modulus, min_size, max_size)
                ):
                    enc = chunk.encode("utf-8")
                    ids.append(i)
                    seqs.append(k)
                    hs.append(hashlib.md5(enc).hexdigest())
                    lns.append(len(enc))
            yield pd.DataFrame(
                {id_col: ids, "seq": seqs, "h": hs, "ln": lns}
            )

    return src.mapInPandas(chunk_iter, out_schema)


def cdc_index(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = DEFAULT_WINDOW,
    modulus: int = DEFAULT_MODULUS,
    min_size: _ty.Optional[int] = None,
    max_size: _ty.Optional[int] = None,
) -> SDF:
    """Distinct chunk hashes of a kept corpus: one ``(h)`` row per
    chunk content — the standing CDC index a nightly delivery probes.
    Persist/version it with ``operators.indexstore.publish_index``
    like the MinHash/exact index twins (q149/q150); hashes are 32-char
    md5 hex, ~48 B/row on disk."""
    return (
        cdc_chunks(df, text_col, id_col, window, modulus, min_size, max_size)
        .select("h")
        .distinct()
    )


def cdc_dedup_against_index(
    delta: SDF,
    index: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shared_frac: float = 0.5,
    window: int = DEFAULT_WINDOW,
    modulus: int = DEFAULT_MODULUS,
    min_size: _ty.Optional[int] = None,
    max_size: _ty.Optional[int] = None,
) -> SDF:
    """Incremental CDC dedup: probe a delivery against a standing
    chunk-hash index and flag documents that are mostly already-known
    bytes. Returns ``(id, shared_bytes, total_bytes, shared_frac,
    keep)`` — ``keep`` is false when at least ``max_shared_frac`` of
    the document's bytes sit in chunks the index already holds (the
    alignment-robust complement to `dedup.dedup_against_index`, which
    needs near-identical WHOLE documents; this catches a new page
    that is 80% stitched from known passages).

    Plan: map-side chunking of the delta only, one hash-keyed left
    join against the index (both sides shuffle on the uniform md5 —
    the index is typically far larger than a delivery, so no
    broadcast), one per-doc agg. Intra-document repeats of a known
    chunk each count as shared bytes: every copy is bytes the corpus
    already has."""
    inst = cdc_chunks(
        delta, text_col, id_col, window, modulus, min_size, max_size
    )
    idx = index.select("h").distinct().withColumn("__hit__", F.lit(1))
    joined = inst.join(idx, "h", "left")
    hit = F.col("__hit__").isNotNull()
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.when(hit, F.col("ln")).otherwise(0)).alias("shared_bytes"),
        F.sum("ln").alias("total_bytes"),
    )
    # NULL-text documents produce zero chunk rows and would silently
    # vanish from the report (and from a stream's survivors) — restore
    # them via the delta's own id set with 0/0 stats, kept, like empty
    # strings. The ids side is a narrow distinct at delivery scale.
    ids = delta.select(id_col).distinct()
    per_doc = ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("shared_bytes"), F.lit(0).cast("long")).alias(
            "shared_bytes"
        ),
        F.coalesce(F.col("total_bytes"), F.lit(0).cast("long")).alias(
            "total_bytes"
        ),
    )
    # empty documents chunk to one zero-length chunk: define them as
    # 0% shared (kept) rather than a null ratio
    frac = F.when(
        F.col("total_bytes") > 0,
        F.col("shared_bytes") / F.col("total_bytes"),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col,
        "shared_bytes",
        "total_bytes",
        # engine-independent half-up rounding, same rule as textstats
        (F.floor(frac * 10000.0 + 0.5) / 10000.0).alias("shared_frac"),
        (frac < max_shared_frac).alias("keep"),
    )


def cdc_dedup_stats(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = DEFAULT_WINDOW,
    modulus: int = DEFAULT_MODULUS,
    min_size: _ty.Optional[int] = None,
    max_size: _ty.Optional[int] = None,
) -> SDF:
    """Per-document chunk-sharing report: ``(id, n_chunks,
    n_shared_chunks, shared_bytes, total_bytes)`` where a chunk
    instance is *shared* when its content appears in more than one
    DISTINCT document (intra-document repeats do not count).

    Plan shape: map-side chunking -> groupBy(md5) with map-side
    partial count-distinct -> join back on md5 -> per-doc agg. Two
    shuffles, both keyed on a uniform 128-bit hash.

    r12 (guide §4/§5): ``inst`` feeds BOTH the doc-frequency aggregate
    and the join-back — two physical consumers whose common subtree is
    the Python chunker, and exchange reuse cannot fuse them (the
    consumers' exchanges differ), so the per-character chunking UDF ran
    TWICE per action. One lazy lineage cut caps it at one pass:
    measured at sf0.1 in one session, wall 2.08 -> 1.32 s (-37%) with
    shuffle bytes IDENTICAL (7,535,289 — the plan's exchanges are
    untouched, only the recompute is gone). A repartition('h')-shared
    variant (guide §2.4) also single-passes the chunker but re-keys the
    instance exchange (+10% bytes) and measured slower; rejected."""
    inst = cdc_chunks(df, text_col, id_col, window, modulus, min_size, max_size)
    from torcharrow_spark.operators.preprocess import lineage_cut

    inst = lineage_cut(inst)
    freq = inst.groupBy("h").agg(F.countDistinct(id_col).alias("ndocs"))
    shared = F.col("ndocs") > 1
    return (
        inst.join(freq, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(shared, 1).otherwise(0)).alias("n_shared_chunks"),
            F.sum(F.when(shared, F.col("ln")).otherwise(0)).alias("shared_bytes"),
            F.sum("ln").alias("total_bytes"),
        )
    )
