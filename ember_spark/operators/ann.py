"""Approximate-nearest-neighbor search over an embedding column.

- brute-force cosine top-k: the correctness baseline; broadcast the
  query side, native cosine, window top-k. O(Q x N) but fully
  distributed over N — right answer for small Q at any N.
- LSH-bucketed top-k: random-hyperplane buckets with multi-probe
  (signature hamming-neighbors), approximate at web scale.
- IVF top-k: a driver-trained k-means coarse quantizer (centroids are
  tiny and broadcast), corpus partitioned into inverted lists by an
  argmax-cosine Arrow UDF, queries probe their `n_probe` nearest lists
  via an equi-join, exact cosine re-ranks. `n_probe == n_centroids`
  degenerates to exact brute force (tested); recall/cost scales with
  `n_probe`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ember_spark.functions.hashing import make_hyperplane_bands_udf
from ember_spark.functions.similarity import cosine_sim


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared per-query ranking epilogue: deterministic top-k by
    (cos desc, neighbor_id asc) — one definition so the tie-break and
    output schema cannot drift between the three ANN variants."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k per query (query side broadcast).

    Ties break by neighbor id ascending (deterministic).
    Self-matches (same id) are excluded.
    """
    from ember_spark.operators.blocking import ensure_parallelism

    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(emb_col).alias("q_emb"))
    # the per-pair cosine (an interpreted HOF aggregate, Q x N
    # evaluations) inherits the corpus scan's partitioning; a small
    # single-file corpus otherwise serializes the whole O(QxN) compute
    # onto one core (measured 3x the wall at sf0.1). No-op at scale,
    # where the scan already has >= parallelism partitions (guide §2.5
    # input-skew: repartition immediately after a narrow read).
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_sim(F.col("q_emb"), F.col("c_emb")))
    )
    return _rank_topk(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bands: int = 8,
    rows: int = 3,
    probe_bits: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via BANDED hyperplane LSH: the corpus emits
    `bands` bucket keys of `rows` sign bits each; a query probes every
    band bucket within hamming distance `probe_bits` of its own bits
    (the full combination ball, not just single-bit flips). Candidates
    share >=1 probed bucket; exact cosine re-ranks. Recall grows with
    bands and probe_bits; per-query cost stays ~bucket-sized."""
    if dim is None:
        # infer from the first NON-NULL embedding: first() on a null
        # row gave dim=-1 (F.size(null)), making every banding UDF row
        # fail its length check and the query silently return empty
        row = (
            corpus.filter(F.col(emb_col).isNotNull())
            .select(F.size(F.col(emb_col)).alias("d"))
            .first()
        )
        if row is None:
            raise ValueError(
                "lsh_topk: cannot infer dim from an empty or"
                " all-null-embedding corpus; pass dim="
            )
        dim = int(row["d"])
    corpus_keys = make_hyperplane_bands_udf(dim, bands, rows)
    query_keys = make_hyperplane_bands_udf(dim, bands, rows, probe_bits=probe_bits)
    sig_c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        F.explode(corpus_keys(F.col(emb_col))).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.explode(query_keys(F.col(emb_col))).alias("bucket"),
    ).dropDuplicates(["query_id", "bucket"])
    scored = (
        q.join(sig_c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", cosine_sim(F.col("q_emb"), F.col("c_emb")))
    )
    return _rank_topk(scored, k)


# ------------------------------------------------------------- IVF
def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 50_000,
    iters: int = 12,
    seed: int = 142,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a DETERMINISTIC
    hash-sample of the corpus (hash(id) ordering is partition-layout
    independent, unlike df.sample whose draw depends on row order).
    The sample — not the corpus — crosses to the driver: a coarse
    quantizer needs only ~1000x its centroid count in training points,
    so `sample_size` stays driver-safe at any corpus scale. Returns
    (n_centroids, dim) float64, rows L2-normalized."""
    samp = (
        # null embeddings carry no geometry and would poison the
        # np.asarray matrix build (ragged object array)
        corpus.filter(F.col(emb_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_e"))
        .withColumn("_h", F.xxhash64(F.col("_id"), F.lit(seed)))
        .orderBy("_h")
        .limit(sample_size)
        .select("_e")
        .collect()
    )
    if not samp:
        raise ValueError(
            "train_centroids: empty corpus/sample — nothing to quantize"
        )
    X = np.asarray([r["_e"] for r in samp], dtype=np.float64)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(n > 0, n, 1.0)
    rng = np.random.default_rng(seed)
    kc = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=kc, replace=False)]
    for _ in range(iters):
        # spherical k-means: assign by max dot (== cosine on unit rows)
        assign = np.argmax(X @ C.T, axis=1)
        newC = np.zeros_like(C)
        for j in range(kc):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                nm = np.linalg.norm(m)
                newC[j] = m / nm if nm > 0 else C[j]
            else:  # dead list: reseed from a random point (seeded rng)
                newC[j] = X[rng.integers(len(X))]
        if np.allclose(newC, C, atol=1e-9):
            C = newC
            break
        C = newC
    return C


def _assign_udfs(centroids: np.ndarray, n_probe: int):
    """Two Arrow UDFs over a broadcast-by-closure centroid matrix:
    corpus-side argmax list id, query-side top-n_probe list ids."""
    C = centroids  # (k, dim) float64, unit rows; ships in the closure

    @F.pandas_udf(IntegerType())
    def _nearest(emb: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def _topn(emb: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        sims = X @ C.T
        p = min(n_probe, C.shape[0])
        idx = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return _nearest, _topn


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 8,
    centroids: np.ndarray | None = None,
    sample_size: int = 50_000,
    seed: int = 142,
) -> DataFrame:
    """IVF approximate top-k: corpus rows land in the inverted list of
    their nearest centroid (one int32 key — at rest this is a partition
    column, so a probe reads n_probe/n_centroids of the data); each
    query explodes to its `n_probe` nearest lists; an equi-join on the
    list id yields candidates; exact cosine re-ranks.

    The shuffle is an equi-join on a low-cardinality int key — no
    crossJoin, no driver loop; centroid training is the only driver
    step and touches a bounded hash-sample. Pass a precomputed
    `centroids` matrix to reuse a trained quantizer across calls
    (the at-scale pattern: train once, probe many).
    Recall is governed by n_probe; n_probe == n_centroids is exact
    (every list probed == brute force)."""
    if centroids is None:
        centroids = train_centroids(
            corpus, n_centroids, emb_col, id_col,
            sample_size=sample_size, seed=seed,
        )
    # drop null / wrong-width embeddings BEFORE the assignment UDFs:
    # np.stack over a batch containing None raises an opaque shape
    # error and fails the whole job, where the sibling LSH path just
    # drops such rows (its banding UDF length-checks per row) — same
    # tolerance here, same semantics: an invalid vector can be neither
    # a neighbor nor a query.
    valid = F.col(emb_col).isNotNull() & (
        F.size(F.col(emb_col)) == int(centroids.shape[1])
    )
    corpus = corpus.filter(valid)
    queries = queries.filter(valid)
    nearest_udf, topn_udf = _assign_udfs(centroids, n_probe)
    inv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        nearest_udf(F.col(emb_col)).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.explode(topn_udf(F.col(emb_col))).alias("list_id"),
    )
    scored = (
        q.join(inv, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_sim(F.col("q_emb"), F.col("c_emb")))
    )
    return _rank_topk(scored, k)
