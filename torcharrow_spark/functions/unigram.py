"""Unigram-LM (SentencePiece-style) subword tokenization.

Capability parity with the tokenizer family the reference exposes
through ``bpe_tokenize`` (reference torcharrow/functional.py:145-175,
C++ kernel csrc/velox/functions/text/gpt2_bpe_tokenizer.cpp): half of
real pipelines (T5/LLaMA lineage) tokenize with a Unigram language
model instead of BPE. The algorithm here is the public Unigram LM of
Kudo 2018 ("Subword Regularization", the SentencePiece default):
every vocabulary piece carries a log-probability, and a word's
tokenization is the Viterbi-optimal segmentation — the piece sequence
covering the word with MAXIMUM total log-probability. Unlike BPE's
greedy merge loop, the optimum is found by dynamic programming and can
prefer ("th","en") over the longest-prefix ("the","n") when the
probabilities say so: greedy longest-match is NOT equivalent, and the
toy vocabulary below deliberately contains such cases so tests and the
q168 oracle exercise real Viterbi, not a lookup that greedy would also
pass.

Spark-first execution: the tokenizer (piece table — megabytes at real
vocab sizes, not gigabytes) is closure-captured ONCE per executor by an
Arrow-batched ``pandas_udf``; per batch we segment a pandas Series of
strings. Same sanctioned slow path as functions/bpe.py: a
data-dependent DP over each word is not expressible in Spark SQL.

Determinism contract: scores are INTEGER piece costs (cost =
-logprob * scale, distinct per piece, magnitudes ~1e3) summed in
int64 — bit-identical on any platform and replayable in SQL integer
arithmetic; the toy vocabulary is constructed so no two segmentations
of any word tie (pytest enumerates all segmentations of both test
corpora to prove it), making the Viterbi argmax unique and
engine-independent.

No tokenizer asset ships with the repo: callers pass their own
``{piece: cost}`` table (e.g. converted from a public SentencePiece
``.vocab`` file's logprobs), or use ``UnigramTokenizer.toy()`` for a
deterministic self-contained instance.
"""

from __future__ import annotations

import typing as _ty

import pandas as pd


class UnigramTokenizer:
    """Viterbi segmentation over an integer-cost piece vocabulary.

    ``vocab`` maps piece -> positive integer cost (lower = more
    probable; cost plays -logprob). Every single character the input
    can contain must be present so any word is segmentable — the
    SentencePiece convention of keeping all seen characters as
    fallback pieces.
    """

    def __init__(
        self, vocab: _ty.Dict[str, int], canonical_ties: bool = False
    ):
        if not vocab:
            raise ValueError("unigram: empty vocabulary")
        bad = [p for p, c in vocab.items() if not p or int(c) <= 0]
        if bad:
            raise ValueError(f"unigram: empty piece or non-positive cost: {bad[:3]}")
        self.vocab = {p: int(c) for p, c in vocab.items()}
        self.max_len = max(len(p) for p in self.vocab)
        #: canonical_ties=True resolves equal-cost segmentations to the
        #: LEXICOGRAPHICALLY SMALLEST piece list — the total order a SQL
        #: replay can state (``ORDER BY cost, pieces``). TRAINED vocabs
        #: need it: ln-derived integer costs cannot guarantee the
        #: tie-freedom the toy vocabulary proves by enumeration. The
        #: local DP choice is globally correct: two prefixes covering
        #: the same chars can never be element-wise prefixes of each
        #: other (pieces are nonempty), so comparing prefix piece-lists
        #: decides the full-sequence comparison regardless of the
        #: (shared-suffix) remainder.
        self.canonical_ties = bool(canonical_ties)
        # stable piece ids: cost ascending, then piece — the id table a
        # downstream embedding matrix would be built against
        self.ids = {
            p: i
            for i, (p, _) in enumerate(
                sorted(self.vocab.items(), key=lambda kv: (kv[1], kv[0]))
            )
        }

    @classmethod
    def toy(cls) -> "UnigramTokenizer":
        """Deterministic small vocabulary over [a-z ]: all 26 letters as
        fallback pieces plus common English subwords, with costs chosen
        so (a) Viterbi genuinely diverges from greedy longest-match —
        'the' is EXPENSIVE, so 'then' segments as th|en, not the|n —
        and (b) segmentation sums never tie (distinct odd-ish values,
        verified exhaustively in tests over the driver corpora)."""
        vocab: _ty.Dict[str, int] = {}
        for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
            vocab[ch] = 1009 + 17 * i  # distinct, expensive fallbacks
        multi = {
            "th": 551, "he": 563, "in": 569, "er": 577, "an": 587,
            "re": 593, "on": 601, "at": 607, "en": 613, "nd": 617,
            "ti": 619, "es": 631, "or": 641, "te": 643, "of": 647,
            "ed": 653, "is": 659, "it": 661, "al": 673, "ar": 677,
            "st": 683, "to": 691, "nt": 701, "ng": 709, "se": 719,
            "ing": 827, "ion": 829, "ent": 839, "ati": 853, "for": 857,
            "and": 859, "ter": 863, "tion": 1021,
            # deliberately overpriced long pieces: greedy longest-match
            # grabs them, Viterbi must not ('the' = 1801 > th+he? no:
            # th|e = 551+1077; the point is the|n loses to th|en)
            "the": 1801, "this": 2203, "here": 2207,
        }
        vocab.update(multi)
        return cls(vocab)

    #: per-instance memo cap: natural-language word-type counts plateau
    #: far below this; a hostile high-entropy stream resets the dict
    #: rather than growing worker memory without bound
    _MEMO_CAP = 1 << 17

    def __getstate__(self):
        # the memo never rides a task closure: each worker rebuilds
        # its own (keeps serialized tasks small; contents would be
        # correct either way — the memo only holds pure-function
        # results)
        d = dict(self.__dict__)
        d.pop("_memo", None)
        return d

    def encode_word(self, w: str) -> _ty.List[str]:
        """Viterbi-optimal segmentation (min total cost). Characters
        absent from the vocabulary raise — the toy/test corpora are
        pre-normalized, and a real vocab includes all seen chars.

        Memoized by word (r13, guide §4.5): segmentation is a pure
        function of (vocab, w) and corpora repeat word TYPES heavily,
        so each worker pays the DP once per type. The memo starts
        empty on every (de)serialized copy — callers always see the
        pure-function result; the returned list is a COPY so mutating
        callers cannot poison the cache."""
        memo = self.__dict__.setdefault("_memo", {})
        hit = memo.get(w)
        if hit is None:
            if self.canonical_ties:
                hit = self._encode_word_canonical(w)
            else:
                hit = self._encode_word_min(w)
            if len(memo) >= self._MEMO_CAP:
                memo.clear()
            memo[w] = hit
        return list(hit)

    def _encode_word_min(self, w: str) -> _ty.List[str]:
        n = len(w)
        INF = float("inf")
        best: _ty.List[float] = [INF] * (n + 1)
        back: _ty.List[_ty.Optional[int]] = [None] * (n + 1)
        best[0] = 0
        for i in range(1, n + 1):
            lo = max(0, i - self.max_len)
            for j in range(lo, i):
                if best[j] == INF:
                    continue
                piece = w[j:i]
                c = self.vocab.get(piece)
                if c is None:
                    continue
                cand = best[j] + c
                if cand < best[i]:
                    best[i] = cand
                    back[i] = j
        if best[n] == INF:
            raise ValueError(f"unigram: unsegmentable word {w!r}")
        out: _ty.List[str] = []
        i = n
        while i > 0:
            j = back[i]
            out.append(w[j:i])
            i = j
        out.reverse()
        return out

    def _encode_word_canonical(self, w: str) -> _ty.List[str]:
        """Tuple-DP Viterbi: per position keep the minimal
        ``(cost, pieces)`` pair, so equal-cost segmentations resolve to
        the lexicographically smallest piece list — the tie rule a SQL
        ``ORDER BY cost, pieces`` replay states exactly."""
        n = len(w)
        best: _ty.List[_ty.Optional[_ty.Tuple[int, tuple]]] = [None] * (
            n + 1
        )
        best[0] = (0, ())
        for i in range(1, n + 1):
            lo = max(0, i - self.max_len)
            for j in range(lo, i):
                bj = best[j]
                if bj is None:
                    continue
                c = self.vocab.get(w[j:i])
                if c is None:
                    continue
                cand = (bj[0] + c, bj[1] + (w[j:i],))
                if best[i] is None or cand < best[i]:
                    best[i] = cand
        if best[n] is None:
            raise ValueError(f"unigram: unsegmentable word {w!r}")
        return list(best[n][1])

    def encode(self, text: str) -> _ty.List[str]:
        """Whitespace pre-tokenization, then per-word Viterbi — the
        piece stream of the whole text."""
        pieces: _ty.List[str] = []
        for w in text.split():
            pieces.extend(self.encode_word(w))
        return pieces

    def encode_ids(self, text: str) -> _ty.List[int]:
        return [self.ids[p] for p in self.encode(text)]

    def cost(self, pieces: _ty.Iterable[str]) -> int:
        return sum(self.vocab[p] for p in pieces)


def encode_udf(tokenizer: UnigramTokenizer):
    """Arrow-batched pandas UDF ``string -> array<string>`` of pieces;
    the tokenizer rides the serialized task closure to each executor
    once. Module scope for the same pd.Series hint-resolution reason as
    functions/bpe.encode_udf."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: None if s is None else tokenizer.encode(s)
        )

    return _encode


def segment_stats_udf(tokenizer: UnigramTokenizer):
    """Arrow-batched pandas UDF ``string -> struct(n_tokens, total_cost,
    tokens_delim)`` — the oracle-friendly projection: pieces joined
    with '|' inside a word and ' ' between words (so the exact
    segmentation is hashable JVM-side with one md5), plus the exact
    int64 cost sum Viterbi minimized."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_tokens bigint, total_cost bigint, tokens_delim string")
    def _seg(texts: pd.Series) -> pd.DataFrame:
        nt, tc, td = [], [], []
        for s in texts:
            if s is None:
                nt.append(None)
                tc.append(None)
                td.append(None)
                continue
            words = [tokenizer.encode_word(w) for w in s.split()]
            pieces = [p for ps in words for p in ps]
            nt.append(len(pieces))
            tc.append(tokenizer.cost(pieces))
            td.append(" ".join("|".join(ps) for ps in words))
        return pd.DataFrame(
            {"n_tokens": nt, "total_cost": tc, "tokens_delim": td}
        )

    return _seg


def _word_seg_udf(tokenizer: UnigramTokenizer):
    """Arrow-batched pandas UDF ``word -> array<string>`` of the
    word's Viterbi pieces — the trainer's E-step kernel. Module-scope
    factory for the same pd.Series hint-resolution reason as
    ``encode_udf``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _seg(ws: pd.Series) -> pd.Series:
        return ws.map(tokenizer.encode_word)

    return _seg


_AZ = "abcdefghijklmnopqrstuvwxyz"


def unigram_train(
    df,
    text_col: str = "text",
    max_piece_len: int = 3,
    n_seed: int = 40,
    keep: int = 24,
    n_iters: int = 1,
    scale: int = 1_000_000,
) -> _ty.Dict[str, int]:
    """TRAINED Unigram-LM vocabulary (r11, VERDICT r10 ask #4): the
    SentencePiece fit (Kudo 2018) as hard EM over the corpus, every
    step integer/SQL-replayable like q138's Lloyd iterations and
    q169's NB fit.

    Algorithm (each rule mirrored term-for-term by q173's oracle):

    1. **Normalize + word counts** — q41/q168's exact pretokenization
       (lowercase, strip ``[^a-z ]``, collapse spaces); one
       map-side-combined groupBy yields per-word-TYPE instance counts,
       so every later stage runs over word types, not the corpus.
    2. **Seed** — all substrings of length 2..``max_piece_len`` are
       counted (weighted by word frequency, one JVM flatten/explode —
       no UDF) and the top ``n_seed`` by ``count * len`` (ties: piece
       ascending) become candidate pieces; the 26 ``[a-z]`` fallback
       chars always join with add-1-smoothed counts. Seed cost =
       ``floor(-ln(count / total) * scale + 0.5)`` — the integer
       -logprob discipline of the whole tokenizer family.
    3. **E-step** — every word type gets its CANONICAL Viterbi
       segmentation under the current costs (``canonical_ties=True``:
       equal-cost optima resolve to the lexicographically smallest
       piece list, the tie rule SQL can state); piece counts are one
       vocab-bounded aggregate (the ``language_id_train`` shape:
       shuffle volume independent of corpus size).
    4. **M-step + prune** — chars re-smooth (+1); multi-char pieces
       with zero Viterbi count drop, the rest rank by (count desc,
       piece asc) and only the top ``keep`` survive (the count form of
       Kudo's lowest-loss pruning: in hard EM a piece's loss
       contribution IS its count times its cost delta); costs
       renormalize over the survivors.

    Driver state is vocab-bounded throughout (26 + n_seed rows per
    collect); the corpus is scanned once for the seed and once per EM
    iteration. Returns ``{piece: int cost}`` ready for
    ``UnigramTokenizer(vocab, canonical_ties=True)``."""
    import math

    from pyspark.sql import functions as F

    if max_piece_len < 2:
        raise ValueError("unigram_train: max_piece_len must be >= 2")
    t = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
            " +",
            " ",
        )
    )
    words = (
        df.select(F.explode(F.split(t, " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    # r12 (guide §5): the word-TYPE table feeds the seed's two collects
    # and every EM iteration's E-step — each its own action, so the
    # corpus scan + explode + groupBy re-ran 3+ times per fit. One lazy
    # lineage cut makes them read executor-local blocks; the table
    # is vocabulary-bounded (word types, not instances), so the stored
    # blocks stay small at any corpus scale. Measured at sf0.1: fit
    # wall 1.39 -> 0.93 s (-33%) in the same session, identical vocab.
    from torcharrow_spark.operators.preprocess import lineage_cut

    words = lineage_cut(words)
    subs = F.expr(
        f"flatten(transform(sequence(1, {int(max_piece_len)}), l -> "
        "CASE WHEN length(w) >= l THEN "
        "transform(sequence(1, length(w) - l + 1), i -> substring(w, i, l)) "
        "ELSE array() END))"
    )
    subcnt = (
        words.select(F.col("wc"), F.explode(subs).alias("p"))
        .groupBy("p")
        .agg(F.sum("wc").alias("cnt"))
    )
    char_rows = subcnt.where(F.length("p") == 1).collect()
    multi_rows = (
        subcnt.where(F.length("p") >= 2)
        .orderBy((F.col("cnt") * F.length("p")).desc(), F.col("p").asc())
        .limit(int(n_seed))
        .collect()
    )
    obs_char = {r["p"]: int(r["cnt"]) for r in char_rows}
    chars = {c: obs_char.get(c, 0) + 1 for c in _AZ}
    multis = {r["p"]: int(r["cnt"]) for r in multi_rows}

    def _costs(
        char_cnt: _ty.Dict[str, int], multi_cnt: _ty.Dict[str, int]
    ) -> _ty.Dict[str, int]:
        total = sum(char_cnt.values()) + sum(multi_cnt.values())
        return {
            p: int(math.floor(-math.log(c / total) * scale + 0.5))
            for p, c in {**char_cnt, **multi_cnt}.items()
        }

    vocab = _costs(chars, multis)
    for _ in range(int(n_iters)):
        tok = UnigramTokenizer(vocab, canonical_ties=True)
        pc_rows = (
            words.select(
                F.col("wc"),
                F.explode(_word_seg_udf(tok)(F.col("w"))).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("cnt"))
            .collect()
        )
        pc = {r["p"]: int(r["cnt"]) for r in pc_rows}
        chars = {c: pc.get(c, 0) + 1 for c in _AZ}
        kept = sorted(
            ((p, c) for p, c in pc.items() if len(p) >= 2 and c > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[: int(keep)]
        vocab = _costs(chars, dict(kept))
    return vocab
