"""Tokenization (reference op X4, `build_ali_dataset.py:347-349`).

The reference tokenizes Chinese titles with jieba and drops
whitespace-only tokens. jieba is not available here; for CJK text we
use deterministic character bigrams (a standard jieba-free fallback
with equivalent blocking/Jaccard behavior), and for whitespace
languages plain regex splitting — all native Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize_ws(c: Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization, empty tokens dropped (array<string>)."""
    base = F.lower(c) if lowercase else c
    toks = F.split(base, r"\s+")
    return F.filter(toks, lambda t: t != "")


def tokenize_chars(c: Column) -> Column:
    """Split a string into characters (array<string>), whitespace dropped."""
    chars = F.split(c, "")
    return F.filter(chars, lambda ch: (ch != "") & (ch != " "))


def char_ngrams(c: Column, n: int = 2) -> Column:
    """Character n-grams over the normalized string (array<string>).

    Native implementation: substring windows via transform over a
    sequence — no Python. Strings shorter than n yield the whole string
    as the single token.
    """
    s = c
    length = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(s, i, n))


def tokenize_auto(text: Column, lang: Column) -> Column:
    """lang-aware tokenization: CJK -> char bigrams, else whitespace."""
    return F.when(lang == "zh", char_ngrams(text, 2)).otherwise(tokenize_ws(text))
