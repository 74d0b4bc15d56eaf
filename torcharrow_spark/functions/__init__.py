"""Function families too big for a single expression: BPE tokenization
(functions/bpe.py). Scalar string/list/map functions live in the Column
accessors (columns.py) and `functional` (functional.py)."""

from .bpe import BPETokenizer, bpe_tokenize  # noqa: F401

__all__ = ["BPETokenizer", "bpe_tokenize"]
