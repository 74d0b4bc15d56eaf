"""GPT-2-style byte-level BPE tokenization.

Capability parity with the reference's ``bpe_tokenize(tokenizer, col)``
(reference torcharrow/functional.py:145-175 backed by the C++ kernel
csrc/velox/functions/text/gpt2_bpe_tokenizer.cpp). The algorithm here is
the standard public byte-level BPE (OpenAI GPT-2 ``encoder.py``
semantics): byte->unicode remap, regex pre-tokenization, iterative
lowest-rank pair merging, vocab lookup.

Spark-first execution: the tokenizer (encoder + merge ranks — megabytes,
not gigabytes) is closure-captured ONCE per executor by an Arrow-batched
``pandas_udf``; per batch we tokenize a pandas Series of strings. This is
the sanctioned slow path (SURVEY §7.3) — BPE's data-dependent merge loop
is not expressible in Spark SQL.

No tokenizer asset ships with the repo: callers pass their own
``encoder`` / ``merges`` (e.g. parsed from HuggingFace's public
``vocab.json`` + ``merges.txt``), or use ``BPETokenizer.toy()`` for a
deterministic self-contained instance in tests.
"""

from __future__ import annotations

import re
import typing as _ty

import pandas as pd


def _bytes_to_unicode() -> _ty.Dict[int, str]:
    """GPT-2's reversible byte->printable-unicode mapping (public
    algorithm): printable ASCII + latin-1 blocks map to themselves, the
    rest shift into U+0100.."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# GPT-2's pre-tokenizer; ASCII classes via stdlib `re` (the canonical
# \p{L}/\p{N} needs the third-party `regex` module — used when present).
_FALLBACK_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def _pretokenizer():
    try:  # pragma: no cover - environment dependent
        import regex

        return regex.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
        )
    except ImportError:
        return _FALLBACK_PAT


class BPETokenizer:
    """Byte-level BPE: ``encoder`` maps merged token string -> id,
    ``merges`` is the ordered list of (left, right) pairs (rank = index)."""

    def __init__(
        self,
        encoder: _ty.Dict[str, int],
        merges: _ty.Sequence[_ty.Tuple[str, str]],
    ):
        self.encoder = dict(encoder)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_map = _bytes_to_unicode()
        self.pat = _pretokenizer()
        self._cache: _ty.Dict[str, _ty.List[str]] = {}

    @classmethod
    def toy(cls) -> "BPETokenizer":
        """Small deterministic instance covering lowercase words — enough
        to exercise merging, unknown bytes, and multi-token output."""
        merges = [
            ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
            ("o", "n"), ("r", "e"), ("an", "d"), ("in", "g"), ("Ġ", "t"),
            ("Ġt", "he"), ("h", "e"), ("Ġ", "a"), ("Ġ", "s"), ("Ġ", "w"),
        ]
        pieces = set("abcdefghijklmnopqrstuvwxyz") | {"Ġ"}
        for left, right in merges:
            pieces.add(left + right)
        encoder = {p: i for i, p in enumerate(sorted(pieces))}
        return cls(encoder, merges)

    def _bpe(self, token: str) -> _ty.List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            first, second = best
            out: _ty.List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        if len(self._cache) < 100_000:
            self._cache[token] = word
        return word

    def encode(self, text: str) -> _ty.List[int]:
        if text is None:
            return None
        ids: _ty.List[int] = []
        for tok in self.pat.findall(text):
            mapped = "".join(self.byte_map[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                pid = self.encoder.get(piece)
                if pid is None:
                    # unknown piece: per-character fallback, -1 for OOV
                    ids.extend(self.encoder.get(ch, -1) for ch in piece)
                else:
                    ids.append(pid)
        return ids


def encode_udf(tokenizer: BPETokenizer):
    """Arrow-batched pandas UDF `string -> array<int>`; `tokenizer` rides
    the serialized task closure to each executor once. Defined at module
    scope so the `pd.Series` type hints resolve against this module's
    globals (function-local pandas imports break Spark's hint probing
    under `from __future__ import annotations`)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _encode(texts: pd.Series) -> pd.Series:
        return texts.map(tokenizer.encode)

    return _encode


def bpe_tokenize(tokenizer: BPETokenizer, df, text_col: str, id_col: str = "doc_id"):
    """Tokenize ``df[text_col]`` -> (id_col, tokens array<int>)."""
    from pyspark.sql import functions as F

    return df.select(F.col(id_col), encode_udf(tokenizer)(F.col(text_col)).alias("tokens"))
