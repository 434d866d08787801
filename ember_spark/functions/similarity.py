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

import numpy as np
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


def jaro_winkler_batch(
    left, right, max_len: int | None = None, chunk: int = 2048
) -> "np.ndarray":
    """Batch-vectorized Jaro-Winkler, value-identical to
    `jaro_winkler_py` (property-tested): the greedy match loop runs
    over CHAR POSITIONS (<= max_len iterations of numpy ops across the
    whole batch) instead of per pair — one Arrow batch costs ~L matrix
    passes instead of N_pairs Python char loops. This is the scoring
    stage's dominant kernel, so the batch form is what the pair-feature
    UDF calls.

    `left`/`right`: sequences of str | None. None on either side -> 0.0
    (same as the scalar form). Strings are truncated to `max_len`
    BEFORE comparison, exactly like the callers truncate before
    `jaro_winkler_py`.

    Round-5 shape (2.4x the round-4 kernel, and ~1/3 the per-batch
    memory traffic — the quantity that sets the multi-worker DRAM
    knee):
    - chunk encode via ONE `np.array(..., dtype=U<w>)` C conversion
      (0-padded; every consumer masks by length, so the pad value is
      unreachable) instead of a per-string utf-32 loop;
    - rows grouped by their match-window radius `mw`, so the window
      becomes a scalar COLUMN SLICE per iteration — the per-row
      (n,1)-broadcast window compares were the loop's dominant cost.
      Rows of rare radii (group < 32 rows, only in length-heterogeneous
      batches) fall back to the broadcast form to bound the group
      count;
    - `has` gathered from argmax's result instead of a second full
      `any` reduction; u8 compare matrices when the chunk is pure
      Latin-1 (4x narrower than the u32 code points).

    `chunk` bounds the numpy working set: a full 10k Arrow batch
    streams multi-MB temporaries through DRAM on every one of the ~L
    match iterations, which inverts the single-core win once many
    workers share one memory controller; ~2k rows keeps each worker's
    working set cache-resident.
    """
    n = len(left)
    if n > chunk:
        out = np.empty(n, dtype=np.float64)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            out[s:e] = jaro_winkler_batch(left[s:e], right[s:e], max_len, chunk)
        return out
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out

    def _mat(strs):
        ls = np.empty(n, dtype=np.int64)
        clean = []
        for k, s in enumerate(strs):
            if s is None:
                ls[k] = -1
                clean.append("")
            else:
                if max_len is not None:
                    s = s[:max_len]
                ls[k] = len(s)
                clean.append(s)
        w = max(1, int(ls.max()) if ls.size else 1)
        m = np.array(clean, dtype=f"<U{w}").view("<u4").reshape(n, -1)
        return np.ascontiguousarray(m), ls

    A, la = _mat(left)
    B, lb = _mat(right)
    w = max(A.shape[1], B.shape[1])
    if A.shape[1] < w:
        A = np.pad(A, ((0, 0), (0, w - A.shape[1])))
    if B.shape[1] < w:
        B = np.pad(B, ((0, 0), (0, w - B.shape[1])))
    col = np.arange(w)

    valid = (la >= 0) & (lb >= 0)
    # equal strings (incl. both empty) -> 1.0, same as the scalar form
    eq = valid & (la == lb) & (A == B).all(axis=1)
    live = valid & ~eq & (la > 0) & (lb > 0)
    if live.any():
        # u8 fast path: pure Latin-1 chunks compare 4x narrower
        if A.max() < 256 and B.max() < 256:
            Ac, Bc = A.astype(np.uint8), B.astype(np.uint8)
        else:
            Ac, Bc = A, B
        mw = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
        m1 = np.zeros((n, w), dtype=bool)
        m2 = np.zeros((n, w), dtype=bool)

        def _match_sliced(gi: np.ndarray, g_: int) -> None:
            """mw-uniform rows: scalar slice bounds, no broadcasts."""
            Ag, Bg = Ac[gi], Bc[gi]
            lag, lbg = la[gi], lb[gi]
            ng = gi.size
            m1g = np.zeros((ng, w), dtype=bool)
            m2g = np.zeros((ng, w), dtype=bool)
            free = col < lbg[:, None]  # ~matched & in-range, kept in place
            rows = np.arange(ng)
            for i in range(int(lag.max())):
                lo = i - g_ if i > g_ else 0
                hi = i + g_ + 1
                if hi > w:
                    hi = w
                cand = (Bg[:, lo:hi] == Ag[:, i][:, None]) & free[:, lo:hi]
                j = cand.argmax(axis=1)
                has = cand[rows, j]
                rows_h = np.flatnonzero(has & (i < lag))
                jh = j[rows_h] + lo
                m2g[rows_h, jh] = True
                free[rows_h, jh] = False
                m1g[rows_h, i] = True
            m1[gi] = m1g
            m2[gi] = m2g

        def _match_broadcast(gi: np.ndarray) -> None:
            """Mixed-mw rows (rare): the round-4 per-row window form,
            GATHERED into a compact block first so the remaining
            (ng,1)-broadcasts touch only these rows."""
            Ag, Bg = Ac[gi], Bc[gi]
            lag, lbg = la[gi], lb[gi]
            mwg = mw[gi]
            ng = gi.size
            m1g = np.zeros((ng, w), dtype=bool)
            m2g = np.zeros((ng, w), dtype=bool)
            for i in range(int(lag.max())):
                act = i < lag
                if not act.any():
                    break
                lo = np.maximum(0, i - mwg)[:, None]
                hi = np.minimum(lbg, i + mwg + 1)[:, None]
                cand = (
                    (Bg == Ag[:, i][:, None])
                    & ~m2g
                    & (col >= lo)
                    & (col < hi)
                    & act[:, None]
                )
                has = cand.any(axis=1)
                j = cand.argmax(axis=1)
                rows_h = np.flatnonzero(has)
                m2g[rows_h, j[rows_h]] = True
                m1g[rows_h, i] = True
            m1[gi] = m1g
            m2[gi] = m2g

        gs, counts = np.unique(mw[live], return_counts=True)
        misc = np.zeros(n, dtype=bool)
        for g_, cnt in zip(gs, counts):
            sel = live & (mw == g_)
            if cnt >= 32:
                _match_sliced(np.flatnonzero(sel), int(g_))
            else:
                misc |= sel
        if misc.any():
            _match_broadcast(np.flatnonzero(misc))

        matches = m1.sum(axis=1)
        hit = live & (matches > 0)
        if hit.any():
            # transpositions: scatter each side's matched chars by
            # their match rank, then count positional char mismatches
            maxm = int(matches.max())
            rank1 = np.cumsum(m1, axis=1) - 1
            rank2 = np.cumsum(m2, axis=1) - 1
            C1 = np.zeros((n, maxm), dtype=np.uint32)
            C2 = np.zeros((n, maxm), dtype=np.uint32)
            r, c = np.nonzero(m1)
            C1[r, rank1[r, c]] = A[r, c]
            r, c = np.nonzero(m2)
            C2[r, rank2[r, c]] = B[r, c]
            t = ((C1 != C2) & (np.arange(maxm) < matches[:, None])).sum(axis=1) // 2
            m = matches[hit].astype(np.float64)
            out[hit] = (
                m / la[hit] + m / lb[hit] + (m - t[hit]) / m
            ) / 3.0
    out[eq] = 1.0
    # Winkler prefix bonus above 0.7, prefix capped at 4
    boost = out > 0.7
    if boost.any():
        k = min(4, w)
        pmask = (A[:, :k] == B[:, :k]) & (
            np.arange(k) < np.minimum(la, lb)[:, None]
        )
        prefix = np.cumprod(pmask, axis=1).sum(axis=1)
        out[boost] += prefix[boost] * 0.1 * (1.0 - out[boost])
    return out


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
            jaro_winkler_batch(left.tolist(), right.tolist(), max_len=max_len),
            dtype="float64",
        )

    return _jw


jaro_winkler_udf = make_jaro_winkler_udf(80)
