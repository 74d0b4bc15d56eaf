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

    def __init__(self, vocab: _ty.Dict[str, int]):
        if not vocab:
            raise ValueError("unigram: empty vocabulary")
        bad = [p for p, c in vocab.items() if not p or int(c) <= 0]
        if bad:
            raise ValueError(f"unigram: empty piece or non-positive cost: {bad[:3]}")
        self.vocab = {p: int(c) for p, c in vocab.items()}
        self.max_len = max(len(p) for p in self.vocab)
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

    def encode_word(self, w: str) -> _ty.List[str]:
        """Viterbi-optimal segmentation (min total cost). Characters
        absent from the vocabulary raise — the toy/test corpora are
        pre-normalized, and a real vocab includes all seen chars."""
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
