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
    """Split a string into characters (array<string>), whitespace
    dropped — ALL whitespace, not just the space character (tabs and
    newlines used to survive as tokens, polluting Jaccard/blocking
    sets with invisible differences)."""
    chars = F.split(c, "")
    return F.filter(chars, lambda ch: (ch != "") & ~ch.rlike(r"^\s$"))


def char_ngrams(c: Column, n: int = 2) -> Column:
    """Character n-grams over the normalized string (array<string>).

    Native implementation: substring windows via transform over a
    sequence — no Python. NON-EMPTY strings shorter than n yield the
    whole string as the single token; the EMPTY string yields the
    empty array (it used to yield [''], giving any two empty zh texts
    Jaccard 1.0 and a shared blocking key — the ws tokenizer maps ''
    to [] and the two paths must agree that empty text has no tokens).
    Null stays null.
    """
    s = c
    length = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(s, i, n))
    return F.when(length == 0, F.array().cast("array<string>")).otherwise(grams)


def tokenize_auto(text: Column, lang: Column, zh_tokenizer: str = "bigram") -> Column:
    """lang-aware tokenization: CJK -> char bigrams (default) or jieba
    (reference-parity X4, `build_ali_dataset.py:347-349`), else
    whitespace.

    zh_tokenizer='jieba' is an explicit opt-in rather than
    import-detected: plans must not change behavior with the worker
    environment (oracle queries and checkpoints depend on determinism).
    """
    if zh_tokenizer == "jieba":
        zh = jieba_tokenize_udf(text)
    else:
        zh = char_ngrams(text, 2)
    return F.when(lang == "zh", zh).otherwise(tokenize_ws(text))


def have_jieba() -> bool:
    try:
        import jieba  # noqa: F401

        return True
    except ImportError:
        return False


def jieba_tokenize_udf(text: Column) -> Column:
    """jieba word segmentation as an Arrow-batched pandas UDF — the
    reference's exact zh tokenizer (`build_ali_dataset.py:347-349`:
    jieba.cut, whitespace-only tokens dropped). Deterministic: jieba's
    default dictionary cut has no randomness. Raises at plan-build time
    when jieba is absent (this sandbox) — callers keep the char-bigram
    fallback as default."""
    if not have_jieba():
        raise ImportError(
            "jieba is not installed; use tokenize_auto(..., zh_tokenizer='bigram')"
        )
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _jieba(texts: pd.Series) -> pd.Series:
        import jieba

        return pd.Series(
            [
                [t for t in jieba.lcut(x)] if x is not None else []
                for x in texts
            ]
        ).map(lambda toks: [t for t in toks if t.strip() != ""])

    return _jieba(text)
