"""Distributed labeled-benchmark construction.

Reproduces the reference's benchmark-building dataflow
(`build_ali_dataset.py:60-217`) as a pure DataFrame job — the reference
loops clusters in pandas on one machine; this version is the same
semantics over keyed joins + windows and scales with the cluster:

- positives: within-cluster record pairs (J1 self-join on the cluster
  key); HALF "hard" = least-similar by token Jaccard (T1 ascending
  window, `build_ali_dataset.py:77-87`), half random via seeded-md5
  order (T4 deterministic sampling) over the remaining pairs,
- hard negatives: records of the top-N most-similar clusters
  (`SIMILAR_CLUSTER_NUM=12`, `:36,158-172`) — cluster profiles are a
  token-union aggregate (A3), profile similarity comes from an INVERTED
  token INDEX equi-join (no O(C^2) cluster loop), top-N per cluster by
  Jaccard (T3 window),
- random negatives: records paired inside seeded-md5 hash buckets
  across different clusters (`:174-198` random sampling, made
  deterministic and distributed),
- exclusion/dedup: anti-join semantics via canonical pair keys (J3).

Every join is a hash equi-join on (cluster key | token | bucket); no
crossJoin anywhere. Output is the ember pair schema
(url_left/right, text_left/right, lang_left/right,
cluster_id_left/right, label) used by `ERPipeline.fit_matcher`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ember_spark.functions.similarity import token_jaccard
from ember_spark.functions.tokenize import tokenize_auto


def _md5_order(seed: int, *cols) -> F.Column:
    """Deterministic pseudo-random sort key (same construction is
    expressible in ANSI SQL / DuckDB for the oracle)."""
    parts = [F.lit(str(seed))]
    for c in cols:
        parts += [F.lit("#"), F.col(c).cast("string")]
    return F.md5(F.concat(*parts).cast("binary"))


def cluster_profiles(
    records: DataFrame, cluster_col: str = "cluster_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(cluster_id, profile, profile_size): distinct sorted token union
    per cluster (op A3 — the reference's cluster text profile)."""
    return (
        records.select(F.col(cluster_col).alias("cluster_id"), F.col(tokens_col).alias("t"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list("t")))).alias("profile"))
        .withColumn("profile_size", F.size("profile"))
    )


def similar_clusters(
    profiles: DataFrame, top_n: int = 12, max_token_df: int | None = None
) -> DataFrame:
    """Top-N most-similar clusters per cluster by profile Jaccard
    (reference hard-negative mining, `build_ali_dataset.py:164-168`).

    Inverted-index join: explode profile tokens, equi-join on the token,
    count shared tokens per (a, b), Jaccard from profile sizes. Tokens
    present in more than `max_token_df` clusters can be dropped from the
    index (hot-token guard — they only create quadratic candidate fanout
    while adding ~no discrimination). Returns (cluster_id, sim_cluster,
    sim_jaccard, sim_rank), directed, a != b.
    """
    inv = profiles.select(
        F.col("cluster_id"), F.col("profile_size"), F.explode("profile").alias("tok")
    )
    if max_token_df:
        w_tok = Window.partitionBy("tok")
        inv = (
            inv.withColumn("_df", F.count(F.lit(1)).over(w_tok))
            .filter(F.col("_df") <= max_token_df)
            .drop("_df")
        )
    a = inv.select(
        F.col("tok"),
        F.col("cluster_id").alias("c_a"),
        F.col("profile_size").alias("s_a"),
    )
    b = inv.select(
        F.col("tok"),
        F.col("cluster_id").alias("c_b"),
        F.col("profile_size").alias("s_b"),
    )
    inter = (
        a.join(b, "tok")
        .filter(F.col("c_a") != F.col("c_b"))
        .groupBy("c_a", "c_b", "s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sim = inter.withColumn(
        "sim_jaccard",
        F.col("inter").cast("double")
        / (F.col("s_a") + F.col("s_b") - F.col("inter")).cast("double"),
    )
    w = Window.partitionBy("c_a").orderBy(F.col("sim_jaccard").desc(), F.col("c_b").asc())
    return (
        sim.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= top_n)
        .select(
            F.col("c_a").alias("cluster_id"),
            F.col("c_b").alias("sim_cluster"),
            F.col("sim_jaccard"),
            F.col("sim_rank"),
        )
    )


def build_benchmark_pairs(
    records: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
    cluster_col: str = "cluster_id",
    pairs_per_cluster: int = 40,
    neg_per_cluster: int | None = None,
    top_similar: int = 12,
    seed: int = 142,
    rand_buckets: int = 256,
    max_token_df: int | None = None,
) -> DataFrame:
    """Ember-shaped labeled pair benchmark, fully distributed.

    Per cluster: up to `pairs_per_cluster` positives (half hard by
    ascending Jaccard, half seeded-random among the rest) and up to
    `neg_per_cluster` negatives (default 3x positives, the reference's
    1:3 ratio — half hard from the `top_similar` most-similar clusters,
    half random from md5 buckets). Deterministic in (seed); every
    sampling step is a window over a seeded md5 sort key, so the same
    job on the same input yields byte-identical pairs on any cluster.
    """
    neg_per_cluster = neg_per_cluster if neg_per_cluster is not None else 3 * pairs_per_cluster
    n_hard_pos = pairs_per_cluster // 2
    n_rand_pos = pairs_per_cluster - n_hard_pos
    n_hard_neg = neg_per_cluster // 2
    n_rand_neg = neg_per_cluster - n_hard_neg

    base = records.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
        F.col(cluster_col).alias("cluster"),
        tokenize_auto(F.col(text_col), F.col(lang_col)).alias("tokens"),
    )

    sides = lambda suf: base.select(  # noqa: E731
        F.col("id").alias(f"id_{suf}"),
        F.col("text").alias(f"text_{suf}"),
        F.col("lang").alias(f"lang_{suf}"),
        F.col("cluster").alias(f"cluster_{suf}"),
        F.col("tokens").alias(f"tokens_{suf}"),
    )
    pair_cols = [
        "id_l", "id_r", "text_l", "text_r", "lang_l", "lang_r",
        "cluster_l", "cluster_r",
    ]

    # ---------------- positives: within-cluster pairs, hard + random
    pos_all = (
        sides("l")
        .join(sides("r"), F.col("cluster_l") == F.col("cluster_r"))
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn("jac", token_jaccard(F.col("tokens_l"), F.col("tokens_r")))
        .select(*pair_cols, "jac")
    )
    w_hard = Window.partitionBy("cluster_l").orderBy(
        F.col("jac").asc(), F.col("id_l").asc(), F.col("id_r").asc()
    )
    pos_ranked = pos_all.withColumn("rn_hard", F.row_number().over(w_hard))
    pos_hard = pos_ranked.filter(F.col("rn_hard") <= n_hard_pos)
    w_rand = Window.partitionBy("cluster_l").orderBy(
        _md5_order(seed, "id_l", "id_r").asc(), F.col("id_l").asc(), F.col("id_r").asc()
    )
    pos_rand = (
        pos_ranked.filter(F.col("rn_hard") > n_hard_pos)
        .withColumn("rn_rand", F.row_number().over(w_rand))
        .filter(F.col("rn_rand") <= n_rand_pos)
    )
    positives = pos_hard.select(*pair_cols).unionByName(pos_rand.select(*pair_cols))

    # ---------------- hard negatives: records of top-N similar clusters
    profiles = cluster_profiles(base, "cluster", "tokens")
    sims = similar_clusters(profiles, top_n=top_similar, max_token_df=max_token_df)
    hard_raw = (
        sides("l")
        .join(sims, F.col("cluster_l") == F.col("cluster_id"))
        .join(sides("r"), F.col("sim_cluster") == F.col("cluster_r"))
        .filter(F.col("id_l") < F.col("id_r"))  # canonical; dedups mirrored pairs
        .select(*pair_cols)
    )
    w_hneg = Window.partitionBy("cluster_l").orderBy(
        _md5_order(seed + 1, "id_l", "id_r").asc(), F.col("id_l").asc(), F.col("id_r").asc()
    )
    neg_hard = (
        hard_raw.withColumn("rn", F.row_number().over(w_hneg))
        .filter(F.col("rn") <= n_hard_neg)
        .select(*pair_cols)
    )

    # ---------------- random negatives: md5-bucketed cross-cluster pairs
    # bucket count = 16^nchars (hex prefix); size it so a bucket holds
    # ~corpus/16^nchars records — keyed join, never a cartesian
    nchars = max(1, (rand_buckets.bit_length() - 1) // 4)
    bucket = F.substring(_md5_order(seed + 2, "id"), 1, nchars)
    bucketed = base.withColumn("bk", bucket)
    rand_raw = (
        bucketed.select(F.col("bk"), *[F.col(c).alias(f"{c}_l") for c in ["id", "text", "lang", "cluster"]])
        .join(
            bucketed.select(F.col("bk"), *[F.col(c).alias(f"{c}_r") for c in ["id", "text", "lang", "cluster"]]),
            "bk",
        )
        .filter((F.col("cluster_l") != F.col("cluster_r")) & (F.col("id_l") < F.col("id_r")))
        .select(*pair_cols)
    )
    w_rneg = Window.partitionBy("cluster_l").orderBy(
        _md5_order(seed + 3, "id_l", "id_r").asc(), F.col("id_l").asc(), F.col("id_r").asc()
    )
    neg_rand = (
        rand_raw.withColumn("rn", F.row_number().over(w_rneg))
        .filter(F.col("rn") <= n_rand_neg)
        .select(*pair_cols)
    )

    negatives = (
        neg_hard.unionByName(neg_rand).dropDuplicates(["id_l", "id_r"])
    )
    out = positives.withColumn("label", F.lit(1)).unionByName(
        negatives.withColumn("label", F.lit(0))
    )
    return out.select(
        F.col("id_l").alias("url_left"),
        F.col("id_r").alias("url_right"),
        F.col("text_l").alias("text_left"),
        F.col("text_r").alias("text_right"),
        F.col("lang_l").alias("lang_left"),
        F.col("lang_r").alias("lang_right"),
        F.col("cluster_l").alias("cluster_id_left"),
        F.col("cluster_r").alias("cluster_id_right"),
        F.col("label"),
    )
