"""Pairwise scoring: feature computation + broadcast matcher.

Mirrors the reference's matcher surface (SURVEY.md §2.8): the
cross-encoder (`src/models/text_matcher.py:35-59`) becomes a
feature-based classifier per the north_star — token-Jaccard (native,
op X5), Jaro-Winkler (Arrow pandas UDF), hashing-embedding cosine
(native over precomputed embedding arrays) — fed to a broadcast
logistic model whose output reproduces M4's softmax + 0.5 threshold
(`src/models/matcher.py:34`, `scripts/dm.py:120-121`).

Scoring is a single map stage: no shuffle beyond the explicit salted
repartition callers apply before it.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ember_spark.functions.similarity import (
    cosine_sim,
    cosine_sim_fixed,
    jaro_winkler_udf,
    token_jaccard,
)

#: feature column names in model order
FEATURES = ["f_jaccard", "f_containment", "f_jw", "f_cos", "f_len_ratio"]
#: the JVM-native subset (no Python anywhere) used by the cascade's
#: cheap first stage
FEATURES_CHEAP = ["f_jaccard", "f_containment", "f_cos", "f_len_ratio"]


def pair_features(
    pairs: DataFrame,
    text_l: str = "text_l",
    text_r: str = "text_r",
    tokens_l: str = "tokens_l",
    tokens_r: str = "tokens_r",
    emb_l: str = "emb_l",
    emb_r: str = "emb_r",
    emb_dim: int | None = None,
    emb_normalized: bool = False,
    include_jw: bool = True,
    len_l: str | None = None,
    len_r: str | None = None,
) -> DataFrame:
    """Append the matcher's feature columns to a pair table.

    Everything except Jaro-Winkler is JVM-native; JW is one Arrow batch
    UDF (the only Python on the hot path, per the M3 contract). When
    `emb_dim` is known, cosine uses the codegen-friendly static
    expansion instead of HOF `aggregate` (see cosine_sim_fixed).

    `len_l`/`len_r` name precomputed FULL-text length columns for
    f_len_ratio. Callers that truncate the text payload (the scoring
    stage ships only the JW window) must pass them, or inference would
    compute f_len_ratio on capped lengths while training used full
    lengths — a train/serve feature skew.
    """
    len_l = (F.col(len_l) if len_l else F.length(F.col(text_l))).cast("double")
    len_r = (F.col(len_r) if len_r else F.length(F.col(text_r))).cast("double")
    inter = F.size(F.array_intersect(F.col(tokens_l), F.col(tokens_r))).cast("double")
    min_sz = F.least(
        F.size(F.array_distinct(F.col(tokens_l))), F.size(F.array_distinct(F.col(tokens_r)))
    ).cast("double")
    # a NULL token array must score 0.0 like the Arrow kernel's
    # _tok_overlap and with_pair_overlap do: unguarded, ANSI mode gives
    # null features (the pair silently drops out of prediction==1), and
    # non-ANSI's size(null) = -1 gives (-1)/(-1) = a perfect-similarity
    # FALSE POSITIVE
    either_null = F.col(tokens_l).isNull() | F.col(tokens_r).isNull()
    out = (
        pairs.withColumn(
            "f_jaccard",
            F.when(either_null, F.lit(0.0)).otherwise(
                token_jaccard(F.col(tokens_l), F.col(tokens_r))
            ),
        )
        .withColumn(
            # containment |A∩B|/min(|A|,|B|): robust to one-sided token
            # dropout, the failure mode plain Jaccard misses
            "f_containment",
            F.when(either_null | (min_sz == 0), F.lit(0.0)).otherwise(inter / min_sz),
        )
    )
    if include_jw:
        out = out.withColumn("f_jw", jaro_winkler_udf(F.col(text_l), F.col(text_r)))
    return (
        out.withColumn(
            "f_cos",
            cosine_sim_fixed(F.col(emb_l), F.col(emb_r), emb_dim, emb_normalized)
            if emb_dim
            else cosine_sim(F.col(emb_l), F.col(emb_r)),
        )
        .withColumn(
            "f_len_ratio",
            F.when(
                F.greatest(len_l, len_r) == 0, F.lit(1.0)
            ).otherwise(F.least(len_l, len_r) / F.greatest(len_l, len_r)),
        )
    )


def with_pair_overlap(
    df: DataFrame, tok_l: Column, tok_r: Column, distinct: bool = False,
    jac_name: str = "f_jaccard", cont_name: str = "f_containment",
) -> DataFrame:
    """Append JVM-codegen f_jaccard/f_containment over token arrays —
    value-identical to the Arrow kernel's `_tok_overlap` path (null
    side -> size 0, 0/0 -> 0.0, IEEE double division of exact ints),
    but computed by `array_intersect` inside whole-stage codegen so the
    per-pair set work scales with executor cores instead of occupying
    the Python workers. `distinct=True` for raw token-STRING arrays
    (set semantics over possible duplicates); the hashed-token `th`
    payload is unique by construction so plain sizes suffice.

    The intersect lands in its OWN projection (inter/la/lb as
    intermediate columns, each referenced more than once downstream):
    CollapseProject refuses to inline a non-cheap expression into
    multiple references, so `array_intersect` is evaluated exactly
    ONCE per pair — folding it into the jac/cont expressions directly
    re-evaluates it per reference (~4x, measured +100 CPU core-s on a
    3.16M-pair scoring stage)."""
    def _n(c: Column) -> Column:
        sized = F.size(F.array_distinct(c)) if distinct else F.size(c)
        return F.when(c.isNull(), F.lit(0)).otherwise(sized)

    df = df.withColumns({
        "_po_la": _n(tok_l),
        "_po_lb": _n(tok_r),
        "_po_inter": F.when(
            tok_l.isNull() | tok_r.isNull(), F.lit(0)
        ).otherwise(F.size(F.array_intersect(tok_l, tok_r))),
    })
    la, lb, inter = F.col("_po_la"), F.col("_po_lb"), F.col("_po_inter")
    union = la + lb - inter
    mn = F.least(la, lb)
    return df.withColumns({
        jac_name: F.when(union == 0, F.lit(0.0)).otherwise(
            inter.cast("double") / union.cast("double")
        ),
        cont_name: F.when(mn == 0, F.lit(0.0)).otherwise(
            inter.cast("double") / mn.cast("double")
        ),
    }).drop("_po_la", "_po_lb", "_po_inter")


def make_pair_text_features_udf(
    max_len: int = 80, emb_dim: int | None = None,
    include_overlap: bool = True,
):
    """ONE Arrow batch UDF computing the python-only pair features —
    (f_jaccard, f_containment, f_jw[, f_cos]) — from the pair payload.
    This is the north-star scoring shape ("score pairs with batched
    Arrow/pandas UDFs computing Jaro-Winkler + token-Jaccard +
    embedding-cosine features"): feature work runs in Python worker
    PROCESSES, which scale with executors (each brings its own
    workers). Inputs: text_l/r (strings, full or pre-truncated) and
    tok_l/r (token or hashed-token arrays).

    With `emb_dim`, f_cos is RECOMPUTED from the hashed-token arrays
    (`emb_from_th` — the embedding is a pure function of `th`), so the
    pair shuffle never carries the embedding vectors at all: ~dim*4
    bytes per pair side off the widest shuffle of the job, in exchange
    for a bincount per pair in the (linearly-scaling) python workers.
    Without `emb_dim`, cosine stays a JVM codegen concern of the caller
    (`cosine_sim_fixed` over shipped embeddings — the pre-round-3
    shape, kept for token-string callers).

    With `include_overlap=False`, f_jaccard/f_containment are omitted:
    callers compute them JVM-side via `with_pair_overlap` (exact same
    values), leaving this kernel fully batch-vectorized — the per-pair
    `np.intersect1d` loop was the last scalar Python on the scoring hot
    path (~45% of the kernel at ~92 tokens/side).
    """
    from pyspark.sql.types import StructField, StructType

    from ember_spark.functions.hashing import (
        emb_from_th,
        pair_cos_from_th_batch,
        th_from_tokens,
    )
    from ember_spark.functions.similarity import jaro_winkler_batch

    def _emb_vec(x) -> np.ndarray:
        """float64 view of the float32 unit embedding for either a
        hashed-token (int) array or a raw token-string array."""
        a = np.asarray(x) if x is not None else np.empty(0, dtype=np.int32)
        if a.dtype.kind not in "iu":
            a = th_from_tokens(list(x) if x is not None else None)
        return emb_from_th(a, emb_dim).astype(np.float64)

    fields = [
        StructField("f_jaccard", DoubleType()),
        StructField("f_containment", DoubleType()),
    ] if include_overlap else []
    fields.append(StructField("f_jw", DoubleType()))
    if emb_dim:
        fields.append(StructField("f_cos", DoubleType()))
    schema = StructType(fields)

    def _tok_overlap(a, b) -> tuple[int, int, int]:
        """(inter, |a|, |b|) treating each side as a set. int64 arrays
        (the `th` hashed-token payload, unique by construction) hit the
        C-speed sorted-merge intersect; anything else falls back to
        Python sets. The set-building fallback touches one PyObject per
        token — memory-bandwidth-bound and the scoring stage's original
        scaling bottleneck, which is why `prepare` pre-hashes."""
        if a is None or b is None:
            la = 0 if a is None else len(a)
            lb = 0 if b is None else len(b)
            return 0, la, lb
        aa = np.asarray(a)
        if aa.dtype.kind in "iu":
            bb = np.asarray(b)
            inter = np.intersect1d(aa, bb, assume_unique=True).size
            return inter, aa.size, bb.size
        sa, sb = set(a), set(b)
        return len(sa & sb), len(sa), len(sb)

    @F.pandas_udf(schema)
    def _feats(
        text_l: pd.Series, text_r: pd.Series,
        tok_l: pd.Series, tok_r: pd.Series,
    ) -> pd.DataFrame:
        n = len(text_l)
        cos = None
        # JW was ~84% of this kernel as a per-pair Python loop; the
        # batch form runs the greedy match loop over char POSITIONS
        # with numpy across the whole Arrow batch (value-identical,
        # property-tested vs jaro_winkler_py)
        jw = jaro_winkler_batch(text_l.tolist(), text_r.tolist(), max_len=max_len)
        need_toks = include_overlap or bool(emb_dim)
        tl_list = tok_l.tolist() if need_toks else []
        tr_list = tok_r.tolist() if need_toks else []
        if emb_dim:
            # hashed-token (int) payloads take the whole-batch scatter
            # kernel — one bincount per SIDE instead of two bincounts +
            # two norms + a dot per PAIR (~30 -> ~8 µs/pair, and far
            # less allocator churn, the memory-bandwidth knee at wide
            # parallelism). Bit-identical to the per-pair form
            # (property-tested); token-STRING payloads keep the scalar
            # path through th_from_tokens.
            def _is_int_arr(x) -> bool:
                a = np.asarray(x)
                return a.dtype.kind in "iu"
            probe = next(
                (x for x in tl_list + tr_list if x is not None and len(x)),
                None,
            )
            if probe is None or _is_int_arr(probe):
                cos = pair_cos_from_th_batch(tl_list, tr_list, emb_dim)
            else:
                cos = np.fromiter(
                    (
                        float(np.dot(_emb_vec(a), _emb_vec(b)))
                        for a, b in zip(tl_list, tr_list)
                    ),
                    dtype=np.float64,
                    count=n,
                )
        out = {}
        if include_overlap:
            jac = np.zeros(n)
            cont = np.zeros(n)
            for i in range(n):
                inter, la, lb = _tok_overlap(tl_list[i], tr_list[i])
                union = la + lb - inter
                jac[i] = inter / union if union else 0.0
                mn = min(la, lb)
                cont[i] = inter / mn if mn else 0.0
            out["f_jaccard"] = jac
            out["f_containment"] = cont
        out["f_jw"] = jw
        if emb_dim:
            out["f_cos"] = cos
        return pd.DataFrame(out)

    return _feats


def _collect_training_sample(
    labeled: DataFrame, label_col: str, sample_limit: int
):
    """At most `sample_limit` featurized rows as pandas, shared by both
    matchers' fit_pairs. Inputs within the limit (every in-repo
    training set — they are benchmark-sized by design) collect as-is,
    byte-identical to the historical behavior. An OVERSIZED input is
    re-collected in deterministic xxhash64 order over all selected
    columns: a bare limit() takes an arbitrary partition-order prefix,
    which for a table written positives-then-negatives could be
    single-class — driving the fit toward a constant and degenerating
    the threshold calibration with no warning."""
    sel = labeled.select(*FEATURES, F.col(label_col).cast("double").alias("y"))
    rows = sel.limit(sample_limit + 1).toPandas()
    if len(rows) <= sample_limit:
        return rows
    return (
        sel.orderBy(F.xxhash64(*[F.col(c) for c in sel.columns]))
        .limit(sample_limit)
        .toPandas()
    )


class LogisticMatcher:
    """Tiny logistic-regression matcher over FEATURES.

    fit() runs driver-side on a small labeled pair sample (the
    reference trains on ≤7k pairs — same scale); predict() is pure
    native column arithmetic, so the broadcast "model" is just the
    weight vector folded into the plan (no UDF at inference).
    """

    def __init__(self, weights: list[float] | None = None, bias: float = 0.0, threshold: float = 0.5):
        self.weights = list(weights) if weights is not None else None
        self.bias = float(bias)
        self.threshold = float(threshold)

    # ------------------------------------------------------------ train
    def fit(self, X: np.ndarray, y: np.ndarray, lr: float = 0.5, epochs: int = 400, l2: float = 1e-4):
        """Plain batch gradient descent (numpy, driver-side)."""
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, d = X.shape
        w = np.zeros(d)
        b = 0.0
        for _ in range(epochs):
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            w -= lr * (X.T @ g / n + l2 * w)
            b -= lr * float(g.mean())
        self.weights = [float(v) for v in w]
        self.bias = float(b)
        return self

    def fit_pairs(self, labeled: DataFrame, label_col: str = "label", sample_limit: int = 100_000):
        """Fit from a featurized labeled pair DataFrame (collects at most
        `sample_limit` rows — training data is benchmark-sized by design)."""
        rows = _collect_training_sample(labeled, label_col, sample_limit)
        X, y = rows[FEATURES].to_numpy(), rows["y"].to_numpy()
        self.fit(X, y)
        self.calibrate_threshold(X, y)
        return self

    def calibrate_threshold(self, X: np.ndarray, y: np.ndarray) -> float:
        """Pick the decision threshold maximizing F1 on the training
        sample (the reference tunes via val/f1 early-stopping — same
        spirit, `matcher.py:53-58`).

        On near-separable training data a PLATEAU of thresholds attains
        the max F1; taking the first (lowest) one puts the boundary a
        hair above the hardest training negative — a knife edge that
        over-predicts on held-out data (measured: threshold 0.095 with
        63 held-out false positives, vs 0 at the margin midpoint). So:
        candidates include the MIDPOINTS between adjacent observed
        scores (the max-margin points), and among all max-F1 candidates
        the one nearest the M4 contract's 0.5 wins — a centered
        boundary with the same train F1."""
        z = np.asarray(X, dtype=np.float64) @ np.array(self.weights) + self.bias
        p = 1.0 / (1.0 + np.exp(-z))
        scores = np.unique(np.round(p, 3))
        mids = (scores[:-1] + scores[1:]) / 2.0 if len(scores) > 1 else scores
        cands = np.unique(np.concatenate([scores, mids, [0.5]]))
        f1s = np.empty(len(cands))
        for i, t in enumerate(cands):
            pred = p > t
            tp = float(((pred == 1) & (y == 1)).sum())
            fp = float(((pred == 1) & (y == 0)).sum())
            fn = float(((pred == 0) & (y == 1)).sum())
            prec = tp / (tp + fp) if tp + fp else 0.0
            rec = tp / (tp + fn) if tp + fn else 0.0
            f1s[i] = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        best = f1s.max() if len(f1s) else 0.0
        plateau = cands[f1s >= best - 1e-12]
        self.threshold = (
            float(plateau[np.abs(plateau - 0.5).argmin()]) if len(plateau) else 0.5
        )
        return self.threshold

    # -------------------------------------------------------- inference
    def score_col(self):
        """sigmoid(w . f + b) as a native Column (M4 prob-of-match)."""
        assert self.weights is not None, "matcher not fitted"
        z = F.lit(self.bias)
        for w, name in zip(self.weights, FEATURES):
            z = z + F.lit(w) * F.col(name)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def predict(self, feats: DataFrame) -> DataFrame:
        """Append `score` (double) and `prediction` (int, 1 = matched)."""
        return feats.withColumn("score", self.score_col()).withColumn(
            "prediction", (F.col("score") > F.lit(self.threshold)).cast("int")
        )

    # ------------------------------------------------------ persistence
    def to_json(self) -> str:
        return json.dumps(
            {"weights": self.weights, "bias": self.bias, "threshold": self.threshold}
        )

    @classmethod
    def from_json(cls, s: str) -> "LogisticMatcher":
        d = json.loads(s)
        return cls(d["weights"], d["bias"], d["threshold"])

    def score_py(self, feats: list[float]) -> float:
        z = self.bias + sum(w * f for w, f in zip(self.weights, feats))
        return 1.0 / (1.0 + math.exp(-z))


class CascadeMatcher:
    """Two-stage matcher: a JVM-native cheap model (FEATURES_CHEAP)
    decides confidently-matched / confidently-unmatched pairs; only the
    uncertainty band pays for the Python-side Jaro-Winkler feature and
    the full model. At web scale the band is a small fraction of
    candidates, so the hot path stays (almost) entirely in codegen.

    Band calibration: [low, high] are the cheap scores outside which the
    training sample is classified perfectly (with a safety margin), so
    cascade predictions agree with the full model wherever it matters.
    """

    def __init__(
        self,
        cheap: LogisticMatcher | None = None,
        full: LogisticMatcher | None = None,
        low: float = 0.05,
        high: float = 0.95,
    ):
        self.cheap = cheap or LogisticMatcher()
        self.full = full or LogisticMatcher()
        self.low = float(low)
        self.high = float(high)

    def fit_pairs(self, labeled: DataFrame, label_col: str = "label", sample_limit: int = 100_000):
        rows = _collect_training_sample(labeled, label_col, sample_limit)
        y = rows["y"].to_numpy()
        X_full = rows[FEATURES].to_numpy()
        X_cheap = rows[FEATURES_CHEAP].to_numpy()
        self.full.fit(X_full, y)
        self.full.calibrate_threshold(X_full, y)
        self.cheap.fit(X_cheap, y)
        self.cheap.calibrate_threshold(X_cheap, y)
        # band = cheap-score range where train labels mix, widened by a
        # safety margin
        z = X_cheap @ np.array(self.cheap.weights) + self.cheap.bias
        p = 1.0 / (1.0 + np.exp(-z))
        pos, neg = p[y == 1], p[y == 0]
        margin = 0.05
        self.low = max(0.0, float(pos.min()) - margin) if len(pos) else 0.0
        self.high = min(1.0, float(neg.max()) + margin) if len(neg) else 1.0
        if self.low > self.high:  # separable training set: keep a thin band
            mid = (self.low + self.high) / 2
            self.low, self.high = mid - 0.05, mid + 0.05
        # the band must CONTAIN the cheap decision threshold: outside
        # the band the cascade trusts the cheap classification, so with
        # threshold < low, pairs scoring in (threshold, low] — below
        # every confident match seen in training — were routed to the
        # certain branch and predicted as matches without consulting
        # the full model. Widening is the safe direction: it only sends
        # more pairs to the full model.
        thr = float(self.cheap.threshold)
        self.low = min(self.low, thr)
        self.high = max(self.high, thr)
        return self

    def predict_cheap(self, feats: DataFrame) -> DataFrame:
        """Stage 1: native score + band flag (no Python)."""
        cheap_z = F.lit(self.cheap.bias)
        for w, name in zip(self.cheap.weights, FEATURES_CHEAP):
            cheap_z = cheap_z + F.lit(w) * F.col(name)
        cheap_score = F.lit(1.0) / (F.lit(1.0) + F.exp(-cheap_z))
        return feats.withColumn("cheap_score", cheap_score).withColumn(
            "uncertain",
            (F.col("cheap_score") > F.lit(self.low))
            & (F.col("cheap_score") < F.lit(self.high)),
        )

    def to_json(self) -> str:
        return json.dumps(
            {
                "cheap": json.loads(self.cheap.to_json()),
                "full": json.loads(self.full.to_json()),
                "low": self.low,
                "high": self.high,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "CascadeMatcher":
        d = json.loads(s)
        return cls(
            LogisticMatcher(**d["cheap"]), LogisticMatcher(**d["full"]), d["low"], d["high"]
        )
