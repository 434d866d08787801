"""Approximate-nearest-neighbor search over an embedding column.

- brute-force cosine top-k: the correctness baseline; broadcast the
  query side, native cosine, window top-k. O(Q x N) but fully
  distributed over N — right answer for small Q at any N.
- LSH-bucketed top-k: random-hyperplane buckets with multi-probe
  (signature hamming-neighbors), approximate at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ember_spark.functions.hashing import make_hyperplane_bands_udf
from ember_spark.functions.similarity import cosine_sim


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
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(emb_col).alias("q_emb"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_sim(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


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
        dim = int(corpus.select(F.size(F.col(emb_col)).alias("d")).first()["d"])
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
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
