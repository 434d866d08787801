"""Pair-similarity functions (reference ops X5, M3/M5 features).

- token_jaccard: native `array_intersect`/`array_union` — identical
  real-division semantics to the reference's set Jaccard
  (`build_ali_dataset.py:44-47`), whole-stage-codegen'd.
- cosine_sim: native `zip_with` + `aggregate` dot product over
  array<float/double> columns.
- jaro_winkler: the one genuinely scalar-string metric Spark lacks —
  Arrow-batched pandas UDF (never row-at-a-time Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def token_jaccard(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over token arrays (set semantics; 0.0 when both
    empty — the reference assumes non-empty inputs)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def hash_tokens(col: Column) -> Column:
    """Distinct xxhash64 of each token — the once-per-row prep for
    `jaccard_from_hashed`. Hash ONCE per document, then every pair
    comparison works on long arrays instead of strings: ~5x less
    per-pair CPU on a web corpus, and the pair-join shuffle ships 8
    bytes per token instead of the token. Value-identical jaccard
    absent a 64-bit collision inside one compared pair."""
    return F.array_distinct(F.transform(col, lambda t: F.xxhash64(t)))


def jaccard_from_hashed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Set Jaccard over `hash_tokens` arrays with the per-row distinct
    sizes (`F.size` of the hashed array) precomputed: |A ∪ B| comes from
    inclusion-exclusion, so the per-pair work is ONE array_intersect —
    no array_union materialized per pair. Identical values to
    `token_jaccard` on the unhashed arrays (modulo 64-bit collisions)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = na + nb - inter
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two numeric arrays, all JVM-side.

    dot/norms via `aggregate`; 0.0 for zero-norm inputs.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product of two fixed-width arrays as a static expression
    (element_at chain). Unlike `aggregate`/`zip_with`, this contains no
    higher-order function — HOFs evaluate interpreted with per-element
    boxing and anti-scale under thread contention; the static expansion
    stays inside whole-stage codegen."""
    terms = [
        F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def cosine_sim_fixed(a: Column, b: Column, dim: int, normalized: bool = False) -> Column:
    """Cosine over fixed-dim arrays via static expansion. With
    normalized=True (inputs are unit vectors, e.g. the hashing-trick
    embeddings) it is just the dot product."""
    dot = dot_fixed(a, b, dim)
    if normalized:
        return dot
    na = F.sqrt(dot_fixed(a, a, dim))
    nb = F.sqrt(dot_fixed(b, b, dim))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


# ------------------------------------------------------------- jaro-winkler
def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars in order
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler_py(s1: str | None, s2: str | None, prefix_weight: float = 0.1) -> float:
    """Pure-Python Jaro-Winkler (also the test oracle)."""
    if s1 is None or s2 is None:
        return 0.0
    j = _jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return j


def make_jaro_winkler_udf(max_len: int = 80):
    """Arrow-batched Jaro-Winkler over string pair columns.

    Python loops run per Arrow batch (10k rows), not per Spark row —
    this is the sanctioned slow path per SURVEY.md §2.8 M3. JW is
    O(len^2); `max_len` truncates both sides (prefix similarity), the
    standard bound for document-scale inputs — the reference's BERT
    matcher similarly truncates at max_length=256 tokens
    (`configs/ali_tm.yaml`).
    """

    @F.pandas_udf(DoubleType())
    def _jw(left: pd.Series, right: pd.Series) -> pd.Series:
        return pd.Series(
            [
                jaro_winkler_py(
                    a if a is None else a[:max_len], b if b is None else b[:max_len]
                )
                for a, b in zip(left.tolist(), right.tolist())
            ],
            dtype="float64",
        )

    return _jw


jaro_winkler_udf = make_jaro_winkler_udf(80)
