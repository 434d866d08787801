"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting — all native Column expressions so
they stay inside whole-stage codegen AND have exact DuckDB-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ember_spark.functions.text import normalize_text
from ember_spark.functions.tokenize import tokenize_ws
from ember_spark.operators.blocking import ensure_parallelism

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "für", "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
}
LANGS = sorted(LANG_STOPWORDS)  # deterministic tie-break order


def lang_hits(tokens: Column, lang: str) -> Column:
    """Distinct stopwords of `lang` present in the token array."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens, sw))


def lang_id_col(text: Column) -> Column:
    """Heuristic language id: CJK-dominant -> 'zh', else argmax stopword
    hits (ties -> alphabetical lang, 'und' if all zero)."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    toks = tokenize_ws(text)
    out = F.lit("und")
    best = F.lit(0)
    # evaluate langs in reverse-alphabetical so the final `when` chain
    # prefers the alphabetically-first lang on ties
    for lang in reversed(LANGS):
        h = lang_hits(toks, lang)
        out = F.when(h >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(out)
        best = F.greatest(best, h)
    # length > 0: the empty string satisfied 0*2 >= 0 and was labeled
    # 'zh'; empty docs carry no language signal and must fall through
    # to the stopword argmax (which yields 'und' for them)
    return F.when(
        (cjk * 2 >= F.length(text)) & (F.length(text) > 0), F.lit("zh")
    ).otherwise(out)


def add_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    # ensure_parallelism on every textstats op: the per-row work here is
    # regex/tokenize-heavy codegen that inherits the scan's partitioning
    # — a small single-file parquet otherwise serializes the whole pass
    # onto one core (measured 2.4x the wall for quality_features at
    # sf0.1). No-op at scale where the scan is already wide.
    return ensure_parallelism(df).withColumn(out_col, lang_id_col(F.col(text_col)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite [0,1] quality score (heuristics in the Gopher/C4 family,
    arithmetic only so the DuckDB oracle reproduces it exactly)."""
    df = ensure_parallelism(df)
    text = F.col(text_col)
    toks = tokenize_ws(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    all_sw = F.array(*[F.lit(w) for langwords in LANG_STOPWORDS.values() for w in langwords])
    sw_hits = F.size(F.array_intersect(toks, all_sw))
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    # exact mean token length: tokens come from split(\s+), so the sum
    # of token lengths is precisely the count of non-whitespace chars.
    # The previous (n_chars - (n_tokens-1))/n_tokens form assumed
    # exactly one separator char between tokens — repeated or
    # leading/trailing whitespace inflated it and could flip the
    # 2.0<=len<=12.0 quality gate on formatting alone.
    n_nonws = F.length(F.regexp_replace(text, r"\s", ""))
    mean_tok_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        n_nonws.cast("double") / n_tokens
    )
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / n_chars
    )
    sw_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        sw_hits.cast("double") / n_tokens
    )
    score = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(sw_ratio > 0, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex word pieces
    + ceil(chars/4) for long words — a common tokens~chars/4 proxy)."""
    df = ensure_parallelism(df)
    text = F.col(text_col)
    ws = F.size(tokenize_ws(text))
    # word pieces: alnum runs and single non-space symbols
    pieces = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))
    bpe_est = F.ceil(F.length(text).cast("double") / 4.0).cast("long")
    return df.select(
        "*",
        ws.alias("ws_tokens"),
        pieces.alias("word_pieces"),
        bpe_est.alias("bpe_estimate"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set of the normalized text. Identical content ==
    identical fingerprint regardless of token order/duplication."""
    toks = F.array_sort(F.array_distinct(tokenize_ws(normalize_text(F.col(text_col)))))
    return ensure_parallelism(df).withColumn(out_col, F.md5(F.array_join(toks, " ")))
