"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship ER pipeline on sf0.001 documents.
`queries()` exposes one DataFrame-producing callable per implemented
operator from SURVEY.md §2 (+ the training-data-pipeline additions);
`oracle_sql()` gives the DuckDB-equivalent SQL for every
SQL-expressible one. Column names and float rounding are aligned on
both sides so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # module-level: PEP-563 pandas-UDF hints resolve here
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

# tokenization used identically on both sides:
#   spark: _toks(col)   duckdb: _DUCK_TOKS.format(c="text")
_DUCK_TOKS = "list_filter(regexp_split_to_array(lower({c}), '\\s+'), x -> x <> '')"


def _toks(c):
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def _simhash_votes_sql() -> str:
    """64 per-bit majority-vote sums, mirroring simhash64_df's groupBy
    aggregates expression-for-expression (hashing.py:simhash64_df)."""
    return ", ".join(
        f"sum(CASE WHEN (({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) = 1"
        f" THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )


def _simhash_assemble_sql(half: str) -> str:
    """Reassemble one 32-bit half of the simhash from the bit votes."""
    lo_bits = half == "lo"
    return " + ".join(
        f"(CASE WHEN v{b if lo_bits else b + 32} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(32)
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# flagship
# =====================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline (tokenize -> MinHash-LSH blocking ->
    feature scoring -> connected components) over sf0.001 documents;
    returns (url, entity_id, entity_size). Same pinned-jaccard matcher
    as q_er_pipeline_entities (decision = token-jaccard > 0.8565, see
    its docstring for why that makes the dataflow oracle-checkable)."""
    from ember_spark.operators.scoring import LogisticMatcher
    from ember_spark.plans.pipeline import ERPipeline, PipelineConfig

    docs = _t(spark, SF_DEFAULT, "documents").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
        F.col("lang"),
    )
    cfg = PipelineConfig(
        matcher=LogisticMatcher([20.0, 0.0, 0.0, 0.0, 0.0], -17.13),
        use_cascade=False,
    )
    pipe = ERPipeline(spark, cfg)
    # persist the Arrow-UDF stages: cluster()'s eager CC bootstrap plus
    # the sizes-join's two references to `entities` would otherwise
    # re-run the whole prepare->block->score lineage several times
    # (same pattern as q_er_pipeline_entities and ERPipeline.run)
    prepared = pipe.prepare(docs).persist()
    pairs = pipe.block(prepared)
    scored = pipe.score(pairs, prepared).persist()
    entities = pipe.cluster(scored, prepared).persist()
    sizes = entities.groupBy("entity_id").agg(F.count(F.lit(1)).alias("entity_size"))
    return entities.join(sizes, "entity_id").select("url", "entity_id", "entity_size")


# =====================================================================
# queries — relational core (SURVEY.md §2.1-2.7)
# =====================================================================
def q_a1_groupby_count(spark, sf):  # A1: group-by count (value_counts)
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_tpch_q1(spark, sf):  # A1/A5/S2: TPC-H Q1 shape, pruned scan + 1 shuffle
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_f1_semi_join(spark, sf):  # F1/J4: left-semi (EXISTS)
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name")


def q_j3_anti_join(spark, sf):  # J3/U2: left-anti (NOT EXISTS)
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_f2_having_semi(spark, sf):  # F2: drop small groups via census + semi-join
    orders = _t(spark, sf, "orders")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .select("o_custkey")
    )
    return orders.join(big, "o_custkey", "left_semi").select("o_orderkey", "o_custkey")


def q_j1_join_agg(spark, sf):  # J1-analog equi-join + agg; nation broadcast
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    nation = _t(spark, sf, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_j6_salted_join(spark, sf):
    """J1-variant through the skew-spreading salted join: lineitem (fat,
    every row kept) x supplier (compact, replicated salt ways) on
    suppkey, then agg per nation. Salting is a physical rewrite only —
    the oracle is the PLAIN equi-join, which the salted plan must match
    exactly (ember_spark/operators/skew.py)."""
    from ember_spark.operators.skew import salted_join

    li = _t(spark, sf, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity", "l_extendedprice"
    )
    supp = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, supp, on="suppkey", salt=8)
        .groupBy("s_nationkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_q3_shipping(spark, sf):  # J1+T3: join, agg, deterministic top-10
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_t1_topk_per_group_asc(spark, sf):  # T1: per-group top-k ascending
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderkey", "o_custkey", "rn")
    )


def q_t2_topk_per_group_desc(spark, sf):  # T2: per-group top-k descending
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        _t(spark, sf, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "rn")
    )


def q_t3_global_topk(spark, sf):  # T3: global top-k with tie-break
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(12)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def q_t45_deterministic_sample(spark, sf):  # T4/T5: seeded sample via hash order
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string").cast("binary")).asc(),
        F.col("event_id").asc(),
    )
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "rn")
    )


def q_t6_hash_split(spark, sf):  # T6: deterministic hash split + census
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(bucket.isin(*list("0123456789ab")), F.lit("train"))
        .when(bucket.isin("c", "d"), F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        _t(spark, sf, "orders")
        .select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_u1_union_counts(spark, sf):  # U1: union-all then agg
    a = _t(spark, sf, "nation").select(F.col("n_name").alias("name"))
    b = _t(spark, sf, "region").select(F.col("r_name").alias("name"))
    return a.unionByName(b).groupBy("name").agg(F.count(F.lit(1)).alias("n"))


def q_a2_distinct(spark, sf):  # A2: distinct
    return _t(spark, sf, "events").select("event_type").distinct()


def q_f3_null_fill(spark, sf):  # F3 + X7: null fill + literal column
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("props"), F.lit("")).alias("props_filled"),
        F.lit(1).alias("label"),
    )


def q_rollup_counts(spark, sf):  # multi-level aggregate (rollup)
    return (
        _t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_pivot_status(spark, sf):  # pivot (wide aggregation)
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


def q_window_running_sum(spark, sf):  # running aggregate over a window
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def q_event_gaps(spark, sf):  # lag(): inter-event gap per user (as-of style)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = _t(spark, sf, "events")
    # parquet timestamps read as TIMESTAMP_NTZ, which has no direct long
    # cast — go through unix epoch (session TZ pinned to UTC, matching
    # DuckDB's naive epoch())
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        (epoch - F.lag(epoch).over(w)).alias("gap_seconds"),
    )


def q_sessionize(spark, sf):  # §2.10 batch analog: gap-based sessionization
    """Batch sessionization over events via the same window-gap-cumsum
    the streaming operator's oracle uses (ember_spark/streaming/
    sessionize.py:82). One session closes after a 3600s silence; ties on
    ts land in the same session under the default RANGE cumsum frame in
    both engines, so the result is order-deterministic without a
    tiebreaker column."""
    from ember_spark.streaming.sessionize import sessionize_batch

    ev = _t(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    s = sessionize_batch(ev, gap_seconds=3600)
    return s.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start"),
        F.unix_timestamp("session_end").alias("session_end"),
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


def q_a5_hourly_rollup(spark, sf):  # A5: counts + derived stats per key/hour
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH").alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# =====================================================================
# queries — scalar/text ops (SURVEY.md §2.7) over documents
# =====================================================================
def q_x12_regex_replace(spark, sf):  # X1/X2: literal + regex replace
    d = _t(spark, sf, "documents")
    lit_rep = F.replace(F.replace(F.col("text"), F.lit("#;#"), F.lit(" ")), F.lit("#:#"), F.lit(" "))
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(lit_rep, "[aeiou]", "_").cast("binary")).alias("sub_hash"),
    )


def q_x3_serialize_text(spark, sf):  # X3: byte-identical falsy-to-empty space join
    from ember_spark.functions.text import serialize_attrs

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        serialize_attrs(F.col("lang"), F.col("source"), F.col("text")).alias("serialized"),
    )


def q_x4_tokenize_stats(spark, sf):  # X4: tokenize + array stats
    d = _t(spark, sf, "documents")
    toks = _toks(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        # try_element_at, not element_at: under Spark 4's default ANSI
        # mode element_at ABORTS the scan for a document tokenizing to
        # an empty array, while the DuckDB oracle's {toks}[1] returns
        # NULL — try_element_at matches the oracle's NULL semantics
        F.try_element_at(toks, F.lit(1)).alias("first_token"),
        F.try_element_at(toks, F.lit(-1)).alias("last_token"),
    )


def q_a3_token_union_agg(spark, sf):  # A3: per-group set-union aggregate
    d = _t(spark, sf, "documents")
    toks = _toks(F.col("text"))
    return (
        d.select("source", toks.alias("toks"))
        .groupBy("source")
        .agg(
            F.array_join(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("toks")))), " "
            ).alias("vocab"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def q_x5_jaccard_pairs(spark, sf):  # X5 + J1/F4: blocked pairs + token jaccard
    # The pair count is quadratic in block size, so the per-pair work is
    # the whole wall. Two algebraic rewrites of `token_jaccard`, both
    # value-identical (verified against the string/union form over every
    # sf0.1 pair):
    #  - tokens are xxhash64'd ONCE per doc, so each pair intersects
    #    long arrays instead of string arrays (5x on this corpus);
    #    identical jaccard absent a 64-bit collision inside one pair
    #  - |A u B| = |A| + |B| - |A n B| with per-doc distinct sizes
    #    precomputed, dropping the per-pair array_union entirely
    from ember_spark.functions.similarity import hash_tokens, jaccard_from_hashed

    # ensure_parallelism BEFORE the tokenize+hash projection: the test
    # parquet is one small file -> one scan partition, which would
    # serialize the per-doc (interpreted-HOF) work onto a single core.
    # (Driver bench r2/r3 recorded 13.9s here from exactly this: 9s of
    # single-core cold-JIT HOF.) The helper is conditional — a
    # production multi-file scan that is already wider than the session
    # parallelism keeps its file-granularity partitioning untouched.
    from ember_spark.operators.blocking import ensure_parallelism

    d = (
        ensure_parallelism(_t(spark, sf, "documents"))
        .select(
            "doc_id",
            "lang",
            "source",
            hash_tokens(_toks(F.col("text"))).alias("th"),
        )
        .withColumn("nt", F.size("th"))
    )
    # self-join legs would otherwise each re-read the parquet and re-run
    # the (interpreted-HOF) tokenizer+hash; materialize once
    d = d.localCheckpoint()
    l = d.select(
        F.col("lang"), F.col("source"), F.col("doc_id").alias("id_l"),
        F.col("th").alias("t_l"), F.col("nt").alias("n_l"),
    )
    r = d.select(
        F.col("lang"), F.col("source"), F.col("doc_id").alias("id_r"),
        F.col("th").alias("t_r"), F.col("nt").alias("n_r"),
    )
    jac = jaccard_from_hashed(
        F.col("t_l"), F.col("t_r"), F.col("n_l"), F.col("n_r")
    )
    return (
        l.join(r, ["lang", "source"])
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.1)
        .select("id_l", "id_r", "jaccard")
    )


# =====================================================================
# queries — dedup / text-analysis / similarity-search additions
# =====================================================================
def q_dedup_exact(spark, sf):  # exact dedup groups by content hash
    from ember_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "orders"), id_col="o_orderkey", text_col="o_orderpriority")


def q_dedup_exact_documents(spark, sf):  # on real corpus text (0 groups is valid)
    from ember_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def q_fingerprint(spark, sf):  # order-insensitive doc fingerprint
    from ember_spark.operators.textstats import fingerprint

    return fingerprint(_t(spark, sf, "documents")).select("doc_id", "fingerprint")


def q_lang_id(spark, sf):  # stopword/CJK heuristic language id
    from ember_spark.operators.textstats import add_lang_id

    return add_lang_id(_t(spark, sf, "documents")).select("doc_id", "lang_pred")


def q_quality_score(spark, sf):  # quality features
    from ember_spark.operators.textstats import quality_features

    return quality_features(_t(spark, sf, "documents")).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 2).alias("quality_score"),
    )


def q_token_count(spark, sf):  # whitespace + BPE-ish token counting
    from ember_spark.operators.textstats import token_count

    return token_count(_t(spark, sf, "documents")).select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("word_pieces").cast("long").alias("word_pieces"),
        F.col("bpe_estimate").cast("long").alias("bpe_estimate"),
    )


def q_ann_topk(spark, sf):  # brute-force cosine top-k (exact baseline)
    from ember_spark.operators.ann import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    res = brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=3)
    return res.select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))


def q_ann_ivf_topk(spark, sf):
    """IVF top-k with EXHAUSTIVE probe (n_probe == n_centroids): every
    inverted list is probed, so the result is exactly brute force —
    which makes the whole IVF machinery (driver-trained spherical
    k-means quantizer, argmax-cosine list assignment, probe equi-join,
    exact re-rank) value-checkable against the same SQL oracle as
    `ann_topk`. Partial-probe recall is measured separately
    (tests/test_dedup.py::test_ivf_topk_recall_with_partial_probe)."""
    from ember_spark.operators.ann import ivf_topk

    emb = _t(spark, sf, "embeddings")
    res = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=3,
        n_centroids=16, n_probe=16, sample_size=5000,
    )
    return res.select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))


def q_m7_pairwise_prf(spark, sf):  # M7: positive-class P/R/F1 aggregation
    from ember_spark.functions.similarity import cosine_sim

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    l = emb.select(
        F.col("vec_id").alias("id_l"), F.col("embedding").alias("e_l"), F.col("label").alias("y_l")
    )
    r = emb.select(
        F.col("vec_id").alias("id_r"), F.col("embedding").alias("e_r"), F.col("label").alias("y_r")
    )
    pairs = (
        l.crossJoin(r)
        .filter(F.col("id_l") < F.col("id_r"))
        .select(
            (F.col("y_l") == F.col("y_r")).cast("int").alias("label"),
            # round to 6dp before thresholding: Spark's sequential fold and
            # DuckDB's list_dot_product may accumulate in different orders,
            # and one knife-edge pair flips tp/fp (the ann_topk pattern)
            (F.round(cosine_sim(F.col("e_l"), F.col("e_r")), 6) >= 0.15)
            .cast("int")
            .alias("prediction"),
        )
    )
    agg = pairs.agg(
        F.sum(((F.col("prediction") == 1) & (F.col("label") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("prediction") == 1) & (F.col("label") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("prediction") == 0) & (F.col("label") == 1)).cast("long")).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias("recall"),
    )


def q_minhash_lsh_dedup(spark, sf):
    """Shingle MinHash-LSH near-dup, verified by exact shingle Jaccard.

    Oracle-checked for EQUALITY with the brute-force pair set: with
    bands=32, rows=2 a qualifying pair (shingle-jaccard s >= 0.5) is
    missed with prob (1-s^2)^32 <= 1e-4, and on this corpus every
    qualifying pair has s >= 0.9 (miss <= 3e-12) — so verified-LSH
    output == all pairs with jaccard >= threshold.
    """
    from ember_spark.operators.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(
        _t(spark, sf, "documents"),
        threshold=0.5,
        num_hashes=64,
        bands=32,
        rows=2,
        shingle=3,
        verify_shingles=True,
    )
    return out.select("id_l", "id_r", F.round("jaccard", 6).alias("jaccard"))


def q_embedding_neardup_lsh(spark, sf):
    """Banded hyperplane LSH near-dup (bands=16 x rows=3: recall ~0.996
    at cosine exactly 0.5, ~1 above), verified by exact cosine — oracle
    = brute-force pair set."""
    from ember_spark.operators.dedup import embedding_neardup

    out = embedding_neardup(
        _t(spark, sf, "embeddings"), threshold=0.5, bands=16, rows=3
    )
    return out.select("id_l", "id_r", F.round("cos", 6).alias("cos"))


def q_connected_components(spark, sf):
    """CC over edges = same-block token-jaccard >= 0.2. The iterative
    large-star/small-star fixpoint is oracle-checked against DuckDB's
    WITH RECURSIVE transitive closure of the same edge set."""
    from ember_spark.operators.clustering import connected_components

    edges = q_x5_jaccard_pairs(spark, sf).filter(F.col("jaccard") >= 0.2)
    return connected_components(edges, "id_l", "id_r")


def q_benchmark_pairs(spark, sf):
    """Distributed labeled-benchmark construction (the reference's
    build_ali_dataset dataflow): per cluster, hard positives =
    least-similar within-cluster pairs + seeded-random rest; negatives
    drawn from the top-similar clusters (inverted-index profile
    jaccard), hard = MOST-similar record pairs, random = seeded sample
    of the remaining similar-cluster candidates — all windows + keyed
    joins, fully oracle-checked against the same dataflow in SQL.
    Clusters here are synthetic (doc_id // 5) — the op takes ground
    truth clusters as input, like the reference."""
    from ember_spark.operators.benchmark import build_benchmark_pairs

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("url"),
        "text",
        "lang",
        F.floor(F.col("doc_id") / 5).cast("long").alias("cluster_id"),
    )
    return build_benchmark_pairs(
        d,
        pairs_per_cluster=4,
        neg_per_cluster=6,
        top_similar=3,
        seed=142,
        # hot-token guard on the inverted profile index: tokens present
        # in more than 60 cluster profiles add ~no discrimination but
        # quadratic candidate fanout (mirrored in the SQL oracle)
        max_token_df=60,
    )


def _bench_docs(spark, sf):
    """documents with synthetic ground-truth clusters of 10 records
    (>= the suite's min_cluster_size, like the reference's lt-10
    filter, build_ali_dataset.py:355-358)."""
    return _t(spark, sf, "documents").select(
        F.col("doc_id").alias("url"),
        "text",
        "lang",
        F.floor(F.col("doc_id") / 10).cast("long").alias("cluster_id"),
    )


def q_benchmark_rl_pairs(spark, sf):
    """The reference's RL scenario test (build_ali_dataset.py:298-303):
    cluster split (30 main / 10 new), per-cluster 60/40 record split,
    then cross-corpus pairs main-records x new-records — positives
    within the cluster, negatives from the top-3 most-similar clusters
    (profiles from each corpus side). Exercises split_clusters,
    split_records and build_benchmark_pairs' cross mode end-to-end,
    value-checked against the same dataflow in SQL."""
    from ember_spark.operators.benchmark import (
        build_benchmark_pairs,
        split_clusters,
        split_records,
    )

    d = _bench_docs(spark, sf)
    cs = split_clusters(d, "cluster_id", n_main=30, n_extra=10,
                        min_cluster_size=10, seed=142)
    tagged = d.join(cs, "cluster_id")
    main_cl = tagged.filter(F.col("cluster_split") == "main").drop("cluster_split")
    rs = split_records(main_cl, "url", "cluster_id", frac_extra=0.4, seed=142)
    main_rec = rs.filter(F.col("record_split") == "main").drop("record_split")
    extra_rec = rs.filter(F.col("record_split") == "extra").drop("record_split")
    return build_benchmark_pairs(
        main_rec,
        right_records=extra_rec,
        pairs_per_cluster=2,
        neg_per_cluster=6,
        top_similar=3,
        seed=142,
    )


def q_benchmark_imbalanced(spark, sf):
    """The reference's imbalanced-test mode (IMBALANCE_POS_NEG_SIZE,
    build_ali_dataset.py:30,311-315): exact global pos/neg totals —
    per-cluster quota ceil(total/num_clusters), then a seeded global
    take. orderBy+limit plans as TakeOrdered (distributed top-k)."""
    from ember_spark.operators.benchmark import build_benchmark_pairs

    return build_benchmark_pairs(
        _bench_docs(spark, sf),
        pairs_per_cluster=4,
        top_similar=3,
        seed=142,
        total_pos=20,
        total_neg=380,
    )


def q_simhash_dedup(spark, sf):
    """SimHash near-dup pairs — fully oracle-checked since the hash
    went md5-codegen (round 3): the per-token 64-bit hash is md5-hex
    derived, so DuckDB reproduces every simhash bit-for-bit and the
    oracle computes the EXACT hamming<=3 pair set all-pairs. The cap
    is lifted at this tiny scale so the pigeonhole guarantee makes the
    banded result exact (the operator default keeps the cap for
    hot-block safety at scale)."""
    from ember_spark.operators.dedup import simhash_dedup

    return simhash_dedup(_t(spark, sf, "documents"), max_hamming=3, cap=1 << 30)


def q_ann_lsh_topk(spark, sf):
    """Approximate top-k (banded buckets + multi-probe) — VALUE-checked
    since round 4: the hyperplanes are deterministic (blake2b,
    hashing.py:320), so the DuckDB oracle embeds the same plane
    coefficients as literals, rebuilds every band key + the probe ball,
    and checks the exact top-k within the identical candidate union.
    Cross-engine sign-bit safety: min |projection| over this corpus is
    3.7e-5 vs ~6e-16 summation-order error (11 orders of margin).
    Recall (<1 by contract) vs brute force stays separately measured in
    scripts/ann_recall.py (table in BENCH.md)."""
    from ember_spark.operators.ann import lsh_topk

    emb = _t(spark, sf, "embeddings")
    res = lsh_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=3, bands=8, rows=3, probe_bits=1
    )
    return res.select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))


def q_er_pipeline_entities(spark, sf):
    """Flagship e2e pipeline — FULLY value-checked against a DuckDB
    recursive-closure oracle (was rows-only through round 2).

    Two design moves make the whole dataflow SQL-checkable:
    - the matcher weights are pinned to the jaccard feature
      (w=[20,0,0,0,0], b=-17.13): prediction == (token-jaccard >
      0.8565), and on this corpus the nearest achievable jaccard is
      6.4e-4 from the boundary (scripts/explore_thr.py), so the
      decision has zero float-tie risk. Every stage still runs for
      real — prepare's Arrow UDF, multi-key blocking (at sf0.01 the
      shared url-path key makes candidate recall exactly 1: all
      C(500,2) pairs are scored), the 5-feature Arrow scorer, CC,
      singleton union, url re-attach. Trained-matcher quality is
      gated separately (tests/test_pipeline F1 + m7_pairwise_prf).
    - entity ids are remapped from min-rid (xxhash64, not SQL-
      reproducible) to the component's min url.
    """
    from ember_spark.operators.scoring import LogisticMatcher
    from ember_spark.plans.pipeline import ERPipeline, PipelineConfig

    docs = _t(spark, sf, "documents").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    cfg = PipelineConfig(
        matcher=LogisticMatcher([20.0, 0.0, 0.0, 0.0, 0.0], -17.13),
        use_cascade=False,
    )
    pipe = ERPipeline(spark, cfg)
    # cluster() references prepared twice (singletons + url re-attach)
    # and scored once per CC bootstrap — persist both or every
    # reference re-executes the upstream pipeline
    prepared = pipe.prepare(docs).persist()
    scored = pipe.score(pipe.block(prepared), prepared).persist()
    ents = pipe.cluster(scored, prepared)
    emin = ents.groupBy("entity_id").agg(F.min("url").alias("canon_url"))
    return ents.join(emin, "entity_id").select(
        "url", F.col("canon_url").alias("entity_id")
    )


def _fixture_dir() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures"
    )


def q_s1_csv_multidelim(spark, sf):
    """S1: multi-char-delimiter CSV scan (the reference's raw corpus
    dump is `@;@`-separated, `build_ali_corpus.py:16-22`; Spark's csv
    source is single-char, so `read_csv_multichar_delim` = text scan +
    one split). Reads a committed fixture file (the op needs a FILE,
    not a pre-registered table — `sf` is unused); the oracle re-parses
    the same file in DuckDB via split_part over raw lines. Fields
    containing lone '@'/';' chars prove multi-char semantics."""
    from ember_spark.sources.readers import read_csv_multichar_delim

    cols = ["id", "title", "pict_url", "cate_name", "cluster_id"]
    df = read_csv_multichar_delim(
        spark, f"{_fixture_dir()}/s1_ali_sample.txt", "@;@", cols
    )
    return df.select(
        F.col("id").cast("int").alias("id"),
        "title",
        "cate_name",
        F.col("cluster_id").cast("int").alias("cluster_id"),
    )


def q_s4_jsonl_scan(spark, sf):
    """S4: gzip JSON-lines scan with explicit schema + dropped nested
    column (`wdcdatamodule.py:79` reads train.json.gz with pair
    columns and removes the identifier structs). The nested
    `identifiers` column is dropped AT THE SOURCE (Catalyst prunes it
    out of the JSON parse)."""
    from ember_spark.sources.readers import read_jsonl

    schema = (
        "pair_id string, title_left string, title_right string,"
        " label int, identifiers struct<gtin: array<string>, mpn: string>"
    )
    return read_jsonl(
        spark,
        f"{_fixture_dir()}/s4_pairs.jsonl.gz",
        schema=schema,
        drop_columns=["identifiers"],
    )


def q_s6_binary_listing(spark, sf):
    """S6: directory listing as a table via the binaryFile source (the
    image-manifest glob of `build_ali_corpus.py:23`): one row per file
    with name, byte length, and the full content (hex — checkable
    cross-engine; modificationTime excluded as non-deterministic)."""
    from ember_spark.sources.readers import read_binary_files

    df = read_binary_files(spark, f"{_fixture_dir()}/s6_blobs", "*.bin")
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("size_bytes"),
        F.hex(F.col("content")).alias("content_hex"),
    )


def q_s7_image_decode(spark, sf):
    """Multimodal decode as a driver-checked query: binaryFile scan
    over committed image fixtures (one per stdlib-decodable format —
    png/gif/ppm/jpeg/bmp), then ONE Arrow-batched pandas UDF per batch
    of blobs returning (fmt, width, height, mean_gray). No SQL engine
    decodes images, so the oracle is a literal VALUES list produced by
    `scripts/make_image_fixtures.py` — decode is deterministic
    (pure-numpy codecs, functions/codecs.py + functions/jpeg.py), the
    same exact-literal pattern ann_lsh_topk's hyperplanes use.
    Reference parity: the vision matcher's decode step
    (`src/models/vision_matcher.py:33-43`), minus the torch model."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from ember_spark.sources.readers import read_binary_files

    meta_t = StructType(
        [
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_gray", DoubleType()),
        ]
    )

    @F.pandas_udf(meta_t)
    def decode_meta(content: pd.Series) -> pd.DataFrame:
        import numpy as np

        from ember_spark.functions.codecs import (
            decode_image_gray,
            sniff_image_meta,
        )

        rows = []
        for b in content:
            raw = bytes(b)
            w, h, fmt = sniff_image_meta(raw)
            g = decode_image_gray(raw)
            rows.append((fmt, int(w), int(h), float(np.mean(g))))
        return pd.DataFrame(rows, columns=["fmt", "width", "height", "mean_gray"])

    df = read_binary_files(spark, f"{_fixture_dir()}/s7_images", "img_*")
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        decode_meta(F.col("content")).alias("m"),
    ).select("file_name", "m.fmt", "m.width", "m.height", "m.mean_gray")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # file-based sources (committed fixtures — the ops need FILES,
        # not pre-registered tables; oracles re-parse the same files)
        "s1_csv_multidelim": q_s1_csv_multidelim,
        "s4_jsonl_scan": q_s4_jsonl_scan,
        "s6_binary_listing": q_s6_binary_listing,
        "s7_image_decode": q_s7_image_decode,
        # relational core
        "a1_groupby_count": q_a1_groupby_count,
        "tpch_q1": q_tpch_q1,
        "f1_semi_join": q_f1_semi_join,
        "j3_anti_join": q_j3_anti_join,
        "f2_having_semi": q_f2_having_semi,
        "j1_join_agg": q_j1_join_agg,
        "j6_salted_join": q_j6_salted_join,
        "q3_shipping": q_q3_shipping,
        "t1_topk_per_group_asc": q_t1_topk_per_group_asc,
        "t2_topk_per_group_desc": q_t2_topk_per_group_desc,
        "t3_global_topk": q_t3_global_topk,
        "t45_deterministic_sample": q_t45_deterministic_sample,
        "t6_hash_split": q_t6_hash_split,
        "u1_union_counts": q_u1_union_counts,
        "a2_distinct": q_a2_distinct,
        "f3_null_fill": q_f3_null_fill,
        "a5_hourly_rollup": q_a5_hourly_rollup,
        "rollup_counts": q_rollup_counts,
        "pivot_status": q_pivot_status,
        "window_running_sum": q_window_running_sum,
        "event_gaps": q_event_gaps,
        "sessionize": q_sessionize,
        # scalar/text
        "x12_regex_replace": q_x12_regex_replace,
        "x3_serialize_text": q_x3_serialize_text,
        "x4_tokenize_stats": q_x4_tokenize_stats,
        "a3_token_union_agg": q_a3_token_union_agg,
        "x5_jaccard_pairs": q_x5_jaccard_pairs,
        # dedup / text analysis / similarity search
        "dedup_exact": q_dedup_exact,
        "dedup_exact_documents": q_dedup_exact_documents,
        "fingerprint": q_fingerprint,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "m7_pairwise_prf": q_m7_pairwise_prf,
        "benchmark_pairs": q_benchmark_pairs,
        "benchmark_rl_pairs": q_benchmark_rl_pairs,
        "benchmark_imbalanced": q_benchmark_imbalanced,
        # LSH / clustering / pipeline (ALL oracle-checked, incl.
        # ann_lsh_topk since round 4 — see its docstring)
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "simhash_dedup": q_simhash_dedup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "ann_lsh_topk": q_ann_lsh_topk,
        "connected_components": q_connected_components,
        "er_pipeline_entities": q_er_pipeline_entities,
    }


# =====================================================================
# DuckDB oracles
# =====================================================================
def oracle_sql() -> dict[str, str]:
    toks = _DUCK_TOKS.format(c="text")
    fx = _fixture_dir()
    sqls = {
        # DuckDB's csv delim is single-byte, so the oracle parses the
        # multi-char-delimited lines the same way the Spark reader does:
        # raw line scan + split. split_part is 1-indexed.
        "s1_csv_multidelim": f"""
            SELECT split_part(line, '@;@', 1)::INT AS id,
                   split_part(line, '@;@', 2) AS title,
                   split_part(line, '@;@', 4) AS cate_name,
                   -- rejoin fields 5.. : the Spark reader splits with
                   -- limit=5, so delimiter chars inside the LAST field
                   -- survive; split_part(.., 5) would truncate them
                   array_to_string(list_slice(string_split(line, '@;@'), 5, 100000),
                                   '@;@')::INT AS cluster_id
            FROM read_csv('{fx}/s1_ali_sample.txt', delim=chr(1),
                          header=false, quote='', columns={{'line': 'VARCHAR'}})
        """,
        "s4_jsonl_scan": f"""
            SELECT pair_id, title_left, title_right, label::INT AS label
            FROM read_json('{fx}/s4_pairs.jsonl.gz',
                           format='newline_delimited')
        """,
        "s6_binary_listing": f"""
            SELECT parse_filename(filename) AS file_name,
                   size AS size_bytes,
                   upper(hex(content)) AS content_hex
            FROM read_blob('{fx}/s6_blobs/*.bin')
        """,
        # no SQL engine decodes images: the oracle is the exact literal
        # decode output, regenerated by scripts/make_image_fixtures.py
        # (same pattern as ann_lsh_topk's blake2b hyperplane literals)
        "s7_image_decode": """
            SELECT 'img_a.png' AS file_name, 'png' AS fmt, 9::INT AS width, 12::INT AS height, CAST('126.75308641975309' AS DOUBLE) AS mean_gray UNION ALL
            SELECT 'img_b.gif' AS file_name, 'gif' AS fmt, 11::INT AS width, 7::INT AS height, CAST('128.85281385281385' AS DOUBLE) AS mean_gray UNION ALL
            SELECT 'img_c.ppm' AS file_name, 'ppm' AS fmt, 8::INT AS width, 5::INT AS height, CAST('129.15833333333333' AS DOUBLE) AS mean_gray UNION ALL
            SELECT 'img_d.jpg' AS file_name, 'jpeg' AS fmt, 10::INT AS width, 16::INT AS height, CAST('128.58413675128708' AS DOUBLE) AS mean_gray UNION ALL
            SELECT 'img_e.bmp' AS file_name, 'bmp' AS fmt, 6::INT AS width, 6::INT AS height, CAST('126.42592592592592' AS DOUBLE) AS mean_gray
        """,
        "a1_groupby_count": """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "f1_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "j3_anti_join": """
            -- NOT EXISTS (not NOT IN): pins NULL semantics to the
            -- left-anti join's (NOT IN returns zero rows if o_custkey
            -- ever contains a NULL)
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "f2_having_semi": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (
                SELECT o_custkey FROM orders GROUP BY 1 HAVING count(*) >= 5)
        """,
        "j1_join_agg": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "j6_salted_join": """
            SELECT s_nationkey,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   count(*) AS n_rows
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1
        """,
        "q3_shipping": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE o_orderdate < TIMESTAMP '1995-03-15' AND c_mktsegment = 'BUILDING'
            GROUP BY 1 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "t1_topk_per_group_asc": """
            SELECT o_orderkey, o_custkey, rn FROM (
                SELECT o_orderkey, o_custkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
                FROM orders) WHERE rn <= 3
        """,
        "t2_topk_per_group_desc": """
            SELECT c_mktsegment, c_custkey, rn FROM (
                SELECT c_mktsegment, c_custkey,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                FROM customer) WHERE rn <= 5
        """,
        "t3_global_topk": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 12
        """,
        "t45_deterministic_sample": """
            SELECT event_type, event_id, rn FROM (
                SELECT event_type, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY md5(event_id::VARCHAR) ASC,
                                                   event_id ASC) AS rn
                FROM events) WHERE rn <= 5
        """,
        "t6_hash_split": """
            SELECT CASE
                     WHEN substring(md5(o_orderkey::VARCHAR), 1, 1) IN
                          ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
                     WHEN substring(md5(o_orderkey::VARCHAR), 1, 1) IN ('c','d') THEN 'valid'
                     ELSE 'test'
                   END AS split, count(*) AS n
            FROM orders GROUP BY 1
        """,
        "u1_union_counts": """
            SELECT name, count(*) AS n FROM (
                SELECT n_name AS name FROM nation
                UNION ALL SELECT r_name AS name FROM region) GROUP BY 1
        """,
        "a2_distinct": "SELECT DISTINCT event_type FROM events",
        "rollup_counts": """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "pivot_status": """
            SELECT l_returnflag,
                   round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
                   round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
            FROM lineitem GROUP BY 1
        """,
        "window_running_sum": """
            SELECT o_orderkey, o_custkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                     AS running_total
            FROM orders
        """,
        "event_gaps": """
            -- floor() matches Spark's unix_timestamp truncation;
            -- a bare ::BIGINT would round-half-even on fractional seconds
            SELECT event_id, user_id,
                   floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                     AS gap_seconds
            FROM events
        """,
        "f3_null_fill": """
            SELECT event_id, coalesce(props, '') AS props_filled, 1 AS label FROM events
        """,
        "sessionize": """
            -- same gap-cumsum as ember_spark.streaming.sessionize_batch:
            -- epoch() keeps fractional seconds exactly like Spark's
            -- timestamp->double cast (epoch microseconds are exact in a
            -- double, so the > comparison agrees bit-for-bit), and the
            -- cumulative SUM keeps its default RANGE frame so ts ties
            -- share one session in both engines
            WITH g AS (
                SELECT user_id, ts, value,
                       CASE WHEN epoch(ts)
                              - lag(epoch(ts), 1, 0) OVER (
                                  PARTITION BY user_id ORDER BY ts) > 3600
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ), s AS (
                SELECT user_id, ts, value,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts) AS session_id
                FROM g
            )
            SELECT user_id,
                   floor(epoch(MIN(ts)))::BIGINT AS session_start,
                   floor(epoch(MAX(ts)))::BIGINT AS session_end,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM s GROUP BY user_id, session_id
        """,
        "a5_hourly_rollup": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "x12_regex_replace": """
            SELECT doc_id,
                   md5(regexp_replace(
                       replace(replace(text, '#;#', ' '), '#:#', ' '),
                       '[aeiou]', '_', 'g')) AS sub_hash
            FROM documents
        """,
        "x3_serialize_text": """
            SELECT doc_id,
                   coalesce(lang, '') || ' ' || coalesce(source, '') || ' '
                   || coalesce(text, '') AS serialized
            FROM documents
        """,
        "x4_tokenize_stats": f"""
            SELECT doc_id,
                   len({toks}) AS n_tokens,
                   len(list_distinct({toks})) AS n_distinct,
                   {toks}[1] AS first_token,
                   {toks}[-1] AS last_token
            FROM documents
        """,
        "a3_token_union_agg": f"""
            SELECT source,
                   array_to_string(list_sort(list_distinct(flatten(list({toks})))), ' ')
                     AS vocab,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "x5_jaccard_pairs": f"""
            WITH d AS (SELECT doc_id, lang, source, {toks} AS t FROM documents)
            SELECT a.doc_id AS id_l, b.doc_id AS id_r,
                   round(len(list_intersect(a.t, b.t))::DOUBLE
                         / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
            FROM d a JOIN d b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.t, b.t))::DOUBLE
                        / len(list_distinct(list_concat(a.t, b.t))), 6) >= 0.1
        """,
        "dedup_exact": """
            SELECT md5(o_orderpriority) AS content_hash,
                   min(o_orderkey) AS canonical_id, count(*) AS dup_count
            FROM orders GROUP BY 1 HAVING count(*) >= 2
        """,
        "dedup_exact_documents": """
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS canonical_id, count(*) AS dup_count
            FROM documents GROUP BY 1 HAVING count(*) >= 2
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       list_filter(regexp_split_to_array(
                           lower(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
                           '\\s+'), x -> x <> ''))), ' ')) AS fingerprint
            FROM documents
        """,
        "lang_id": f"""
            WITH d AS (
              SELECT doc_id, text, {toks} AS t,
                     len(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk
              FROM documents),
            h AS (
              SELECT doc_id, text, cjk,
                 len(list_intersect(t, ['the','and','of','to','in','is','a','for','with','on'])) AS h_en,
                 len(list_intersect(t, ['der','die','das','und','ist','ein','nicht','mit','für','von'])) AS h_de,
                 len(list_intersect(t, ['el','la','de','que','y','en','un','es','por','los'])) AS h_es
              FROM d)
            SELECT doc_id,
                   CASE WHEN cjk * 2 >= len(text) AND len(text) > 0 THEN 'zh'
                        WHEN h_de >= greatest(h_en, h_es, 1) THEN 'de'
                        WHEN h_en >= greatest(h_es, 1) THEN 'en'
                        WHEN h_es >= 1 THEN 'es'
                        ELSE 'und' END AS lang_pred
            FROM h
        """,
        "quality_score": f"""
            WITH d AS (
              SELECT doc_id, text, {toks} AS t,
                     len(text) AS n_chars,
                     len(regexp_replace(text, '\\s', '', 'g')) AS n_nonws,
                     len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g'))
                       AS n_punct
              FROM documents),
            s AS (
              SELECT doc_id, n_chars, n_nonws, n_punct, len(t) AS n_tokens,
                 len(list_intersect(t,
                   ['the','and','of','to','in','is','a','for','with','on',
                    'der','die','das','und','ist','ein','nicht','mit','für','von',
                    'el','la','de','que','y','en','un','es','por','los'])) AS sw_hits
              FROM d),
            m AS (
              SELECT doc_id, n_tokens,
                CASE WHEN n_tokens = 0 THEN 0.0
                     ELSE n_nonws::DOUBLE / n_tokens END AS mean_token_len,
                CASE WHEN n_chars = 0 THEN 0.0
                     ELSE n_punct::DOUBLE / n_chars END AS punct_ratio,
                CASE WHEN n_tokens = 0 THEN 0.0
                     ELSE sw_hits::DOUBLE / n_tokens END AS stopword_ratio
              FROM s)
            SELECT doc_id, n_tokens,
                   round(mean_token_len, 6) AS mean_token_len,
                   round(punct_ratio, 6) AS punct_ratio,
                   round(stopword_ratio, 6) AS stopword_ratio,
                   round((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
                       + (CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
                       + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
                       + (CASE WHEN stopword_ratio > 0 THEN 0.1 ELSE 0.0 END), 2)
                     AS quality_score
            FROM m
        """,
        "token_count": f"""
            SELECT doc_id,
                   len({toks}) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
                     AS word_pieces,
                   ceil(len(text)::DOUBLE / 4.0)::BIGINT AS bpe_estimate
            FROM documents
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
                       WHERE vec_id < 20),
            c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
            s AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_dot_product(q.e, c.e)
                       / (sqrt(list_dot_product(q.e, q.e))
                          * sqrt(list_dot_product(c.e, c.e))) AS cos_raw
              FROM q JOIN c ON q.vec_id <> c.vec_id),
            r AS (
              SELECT query_id, neighbor_id, cos_raw,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
              FROM s)
            SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS cos
            FROM r WHERE rank <= 3
        """,
        # verified-LSH == brute force (see q_minhash_lsh_dedup docstring);
        # candidates via inverted shingle index (equi-join, no cross)
        "minhash_lsh_dedup": f"""
            WITH d AS (SELECT doc_id, {toks} AS t FROM documents),
            s AS (
              SELECT doc_id,
                     list_distinct(
                       CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(generate_series(1, len(t) - 2),
                                                i -> array_to_string(t[i:i+2], ' '))
                       END) AS g
              FROM d),
            x AS (SELECT doc_id, unnest(g) AS sh FROM s),
            cand AS (SELECT DISTINCT a.doc_id AS id_l, b.doc_id AS id_r
                     FROM x a JOIN x b ON a.sh = b.sh AND a.doc_id < b.doc_id),
            j AS (
              SELECT c.id_l, c.id_r,
                     len(list_intersect(sa.g, sb.g))::DOUBLE
                       / len(list_distinct(list_concat(sa.g, sb.g))) AS jac
              FROM cand c
              JOIN s sa ON sa.doc_id = c.id_l
              JOIN s sb ON sb.doc_id = c.id_r)
            SELECT id_l, id_r, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.5
        """,
        # exact all-pairs hamming over the md5-derived simhash — DuckDB
        # rebuilds every bit of the 64-bit simhash from the same md5
        # hex-substring token hashes Spark's codegen path uses (hi =
        # chars 1-8 -> bits 32-63, lo = chars 9-16 -> bits 0-31); the
        # Spark query lifts the hot-block cap at this scale so its
        # pigeonhole-banded result is exact too
        "simhash_dedup": f"""
            WITH tk AS (
              SELECT doc_id AS id, unnest(list_distinct({toks})) AS t
              FROM documents),
            h AS (
              SELECT id,
                     ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
                     ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo
              FROM tk),
            votes AS (SELECT id, {_simhash_votes_sql()} FROM h GROUP BY id),
            sh0 AS (
              SELECT id, {_simhash_assemble_sql('hi')} AS hi,
                         {_simhash_assemble_sql('lo')} AS lo
              FROM votes),
            sh AS (
              SELECT d.doc_id AS id, coalesce(s.hi, 0)::BIGINT AS hi,
                     coalesce(s.lo, 0)::BIGINT AS lo
              FROM documents d LEFT JOIN sh0 s ON s.id = d.doc_id)
            SELECT a.id AS id_l, b.id AS id_r,
                   (bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)))::INTEGER AS hamming
            FROM sh a JOIN sh b ON a.id < b.id
            WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        """,
        "embedding_neardup_lsh": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
            p AS (
              SELECT a.vec_id AS id_l, b.vec_id AS id_r,
                     list_dot_product(a.emb, b.emb)
                       / (sqrt(list_dot_product(a.emb, a.emb))
                          * sqrt(list_dot_product(b.emb, b.emb))) AS c
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
            SELECT id_l, id_r, round(c, 6) AS cos FROM p WHERE c >= 0.5
        """,
        # transitive closure of the same edge set the Spark query feeds
        # to large-star/small-star
        "connected_components": f"""
            WITH RECURSIVE
            d AS (SELECT doc_id, lang, source, {toks} AS t FROM documents),
            pr AS (
              SELECT a.doc_id AS id_l, b.doc_id AS id_r
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
              WHERE round(len(list_intersect(a.t, b.t))::DOUBLE
                          / len(list_distinct(list_concat(a.t, b.t))), 6) >= 0.2),
            edges AS (SELECT id_l AS a, id_r AS b FROM pr
                      UNION ALL SELECT id_r, id_l FROM pr),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(id, comp) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id)
            SELECT id, min(comp) AS component FROM reach GROUP BY id
        """,
        # the flagship pipeline, end-to-end: lang-aware tokenization,
        # brute-force pair jaccard (the pipeline's candidate recall at
        # sf0.01 is exactly 1 — see q_er_pipeline_entities docstring),
        # decision jaccard > 0.8565 (the pinned matcher's boundary),
        # recursive transitive closure, entity = min url per component,
        # singletons mapping to themselves.
        "er_pipeline_entities": f"""
            WITH RECURSIVE
            d AS (
              SELECT 'doc://' || doc_id::VARCHAR AS url,
                     CASE WHEN lang = 'zh'
                          THEN list_transform(
                                 generate_series(1, greatest(len(text) - 1, 1)),
                                 i -> substring(text, i, 2))
                          ELSE {toks} END AS t
              FROM documents),
            pr AS (
              SELECT a.url AS ul, b.url AS ur
              FROM d a JOIN d b ON a.url < b.url
              -- empty-union jaccard is 0.0, mirroring every Spark
              -- implementation (similarity.py:27, scoring.py:179): two
              -- empty-token docs DO become blocking candidates (identical
              -- MinHash sentinel sigs) but must not oracle-match
              WHERE CASE WHEN len(list_distinct(list_concat(a.t, b.t))) = 0
                         THEN 0.0
                         ELSE len(list_intersect(a.t, b.t))::DOUBLE
                              / len(list_distinct(list_concat(a.t, b.t)))
                    END > 0.8565),
            edges AS (SELECT ul AS a, ur AS b FROM pr
                      UNION ALL SELECT ur, ul FROM pr),
            nodes AS (SELECT url AS id FROM d),
            reach(id, comp) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id)
            SELECT id AS url, min(comp) AS entity_id FROM reach GROUP BY id
        """,
        # the full benchmark-builder dataflow re-expressed in SQL:
        # same windows, same seeded-md5 sort keys, same inverted-index
        # profile similarity; hard negatives = most-similar pairs
        # (jaccard DESC), random negatives = seeded sample of the
        # remaining similar-cluster candidates (params: 2 hard +
        # 2 random positives, 3 hard + 3 random negatives, top-3
        # similar clusters, seed 142)
        "benchmark_pairs": f"""
            WITH base AS (
              SELECT doc_id AS id, text, lang, (doc_id // 5) AS cluster,
                     CASE WHEN lang = 'zh'
                          THEN list_transform(
                                 generate_series(1, greatest(len(text) - 1, 1)),
                                 i -> substring(text, i, 2))
                          ELSE {toks} END AS tokens
              FROM documents),
            pos_all AS (
              SELECT a.id AS id_l, b.id AS id_r, a.text AS text_l, b.text AS text_r,
                     a.lang AS lang_l, b.lang AS lang_r,
                     a.cluster AS cluster_l, b.cluster AS cluster_r,
                     CASE WHEN len(list_distinct(list_concat(a.tokens, b.tokens))) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(list_concat(a.tokens, b.tokens)))
                     END AS jac
              FROM base a JOIN base b ON a.cluster = b.cluster AND a.id < b.id),
            pos_ranked AS (
              SELECT *, row_number() OVER (PARTITION BY cluster_l
                          ORDER BY jac ASC, id_l ASC, id_r ASC) AS rn_hard
              FROM pos_all),
            pos_hard AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM pos_ranked WHERE rn_hard <= 2),
            pos_rand AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_l
                            ORDER BY md5('142#' || id_l::VARCHAR || '#' || id_r::VARCHAR)
                                       ASC, id_l ASC, id_r ASC) AS rn_rand
                FROM pos_ranked WHERE rn_hard > 2)
              WHERE rn_rand <= 2),
            profiles AS (
              SELECT cluster, list_sort(list_distinct(flatten(list(tokens)))) AS profile
              FROM base GROUP BY cluster),
            inv0 AS (SELECT cluster, len(profile) AS s, unnest(profile) AS tok FROM profiles),
            inv AS (
              SELECT cluster, s, tok FROM (
                SELECT *, count(*) OVER (PARTITION BY tok) AS tok_df FROM inv0)
              WHERE tok_df <= 60),
            sims AS (
              SELECT c_a, c_b FROM (
                SELECT c_a, c_b, row_number() OVER (PARTITION BY c_a
                         ORDER BY (inter::DOUBLE / (s_a + s_b - inter)) DESC, c_b ASC)
                         AS sim_rank
                FROM (
                  SELECT a.cluster AS c_a, b.cluster AS c_b, a.s AS s_a, b.s AS s_b,
                         count(*) AS inter
                  FROM inv a JOIN inv b ON a.tok = b.tok AND a.cluster <> b.cluster
                  GROUP BY 1, 2, 3, 4))
              WHERE sim_rank <= 3),
            neg_all AS (
              SELECT a.id AS id_l, b.id AS id_r, a.text AS text_l, b.text AS text_r,
                     a.lang AS lang_l, b.lang AS lang_r,
                     a.cluster AS cluster_l, b.cluster AS cluster_r,
                     CASE WHEN len(list_distinct(list_concat(a.tokens, b.tokens))) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(list_concat(a.tokens, b.tokens)))
                     END AS jac
              FROM base a JOIN sims s ON a.cluster = s.c_a
              JOIN base b ON b.cluster = s.c_b
              WHERE a.id < b.id),
            neg_ranked AS (
              SELECT *, row_number() OVER (PARTITION BY cluster_l
                          ORDER BY jac DESC, id_l ASC, id_r ASC) AS rn_hard
              FROM neg_all),
            neg_hard AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM neg_ranked WHERE rn_hard <= 3),
            neg_rand AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_l
                            ORDER BY md5('143#' || id_l::VARCHAR || '#' || id_r::VARCHAR)
                                       ASC, id_l ASC, id_r ASC) AS rn_rand
                FROM neg_ranked WHERE rn_hard > 3)
              WHERE rn_rand <= 3),
            negatives AS (
              SELECT DISTINCT * FROM
                (SELECT * FROM neg_hard UNION ALL SELECT * FROM neg_rand)),
            labeled AS (
              SELECT *, 1 AS label FROM pos_hard
              UNION ALL SELECT *, 1 AS label FROM pos_rand
              UNION ALL SELECT *, 0 AS label FROM negatives)
            SELECT id_l AS url_left, id_r AS url_right,
                   text_l AS text_left, text_r AS text_right,
                   lang_l AS lang_left, lang_r AS lang_right,
                   cluster_l AS cluster_id_left, cluster_r AS cluster_id_right, label
            FROM labeled
        """,
        # RL scenario: cluster split (md5 seed 142) -> 60/40 record
        # split (md5 seed 152) -> cross-corpus pairs main x extra;
        # 1 hard + 1 random positive, 3 hard (jaccard DESC) + 3 random
        # negatives per cluster from the top-3 similar clusters
        # (left profiles from main records, right from extra records)
        "benchmark_rl_pairs": f"""
            WITH base AS (
              SELECT doc_id AS id, text, lang, (doc_id // 10) AS cluster,
                     CASE WHEN lang = 'zh'
                          THEN list_transform(
                                 generate_series(1, greatest(len(text) - 1, 1)),
                                 i -> substring(text, i, 2))
                          ELSE {toks} END AS tokens
              FROM documents),
            sizes AS (SELECT cluster FROM base GROUP BY cluster
                      HAVING count(*) >= 10),
            cranked AS (
              SELECT cluster, row_number() OVER (
                       ORDER BY md5('142#' || cluster::VARCHAR) ASC, cluster ASC)
                     AS crn
              FROM sizes),
            mc AS (SELECT b.* FROM base b
                   JOIN cranked c USING (cluster) WHERE c.crn <= 30),
            rsplit AS (
              SELECT *, row_number() OVER (PARTITION BY cluster
                          ORDER BY md5('152#' || id::VARCHAR) ASC, id ASC) AS rrn,
                     count(*) OVER (PARTITION BY cluster) AS cnt
              FROM mc),
            main_rec AS (SELECT id, text, lang, cluster, tokens FROM rsplit
                         WHERE rrn <= ceil(cnt * 600000 / 1000000)),
            extra_rec AS (SELECT id, text, lang, cluster, tokens FROM rsplit
                          WHERE rrn > ceil(cnt * 600000 / 1000000)),
            pos_all AS (
              SELECT a.id AS id_l, b.id AS id_r, a.text AS text_l, b.text AS text_r,
                     a.lang AS lang_l, b.lang AS lang_r,
                     a.cluster AS cluster_l, b.cluster AS cluster_r,
                     CASE WHEN len(list_distinct(list_concat(a.tokens, b.tokens))) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(list_concat(a.tokens, b.tokens)))
                     END AS jac
              FROM main_rec a JOIN extra_rec b
                ON a.cluster = b.cluster AND a.id <> b.id),
            pos_ranked AS (
              SELECT *, row_number() OVER (PARTITION BY cluster_l
                          ORDER BY jac ASC, id_l ASC, id_r ASC) AS rn_hard
              FROM pos_all),
            pos_hard AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM pos_ranked WHERE rn_hard <= 1),
            pos_rand AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_l
                            ORDER BY md5('142#' || id_l::VARCHAR || '#' || id_r::VARCHAR)
                                       ASC, id_l ASC, id_r ASC) AS rn_rand
                FROM pos_ranked WHERE rn_hard > 1)
              WHERE rn_rand <= 1),
            profiles_l AS (
              SELECT cluster, list_sort(list_distinct(flatten(list(tokens)))) AS profile
              FROM main_rec GROUP BY cluster),
            profiles_r AS (
              SELECT cluster, list_sort(list_distinct(flatten(list(tokens)))) AS profile
              FROM extra_rec GROUP BY cluster),
            inv_l AS (SELECT cluster, len(profile) AS s, unnest(profile) AS tok
                      FROM profiles_l),
            inv_r AS (SELECT cluster, len(profile) AS s, unnest(profile) AS tok
                      FROM profiles_r),
            sims AS (
              SELECT c_a, c_b FROM (
                SELECT c_a, c_b, row_number() OVER (PARTITION BY c_a
                         ORDER BY (inter::DOUBLE / (s_a + s_b - inter)) DESC, c_b ASC)
                         AS sim_rank
                FROM (
                  SELECT a.cluster AS c_a, b.cluster AS c_b, a.s AS s_a, b.s AS s_b,
                         count(*) AS inter
                  FROM inv_l a JOIN inv_r b ON a.tok = b.tok AND a.cluster <> b.cluster
                  GROUP BY 1, 2, 3, 4))
              WHERE sim_rank <= 3),
            neg_all AS (
              SELECT a.id AS id_l, b.id AS id_r, a.text AS text_l, b.text AS text_r,
                     a.lang AS lang_l, b.lang AS lang_r,
                     a.cluster AS cluster_l, b.cluster AS cluster_r,
                     CASE WHEN len(list_distinct(list_concat(a.tokens, b.tokens))) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(list_concat(a.tokens, b.tokens)))
                     END AS jac
              FROM main_rec a JOIN sims s ON a.cluster = s.c_a
              JOIN extra_rec b ON b.cluster = s.c_b
              WHERE a.id <> b.id),
            neg_ranked AS (
              SELECT *, row_number() OVER (PARTITION BY cluster_l
                          ORDER BY jac DESC, id_l ASC, id_r ASC) AS rn_hard
              FROM neg_all),
            neg_hard AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM neg_ranked WHERE rn_hard <= 3),
            neg_rand AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_l
                            ORDER BY md5('143#' || id_l::VARCHAR || '#' || id_r::VARCHAR)
                                       ASC, id_l ASC, id_r ASC) AS rn_rand
                FROM neg_ranked WHERE rn_hard > 3)
              WHERE rn_rand <= 3),
            negatives AS (
              SELECT DISTINCT * FROM
                (SELECT * FROM neg_hard UNION ALL SELECT * FROM neg_rand)),
            labeled AS (
              SELECT *, 1 AS label FROM pos_hard
              UNION ALL SELECT *, 1 AS label FROM pos_rand
              UNION ALL SELECT *, 0 AS label FROM negatives)
            SELECT id_l AS url_left, id_r AS url_right,
                   text_l AS text_left, text_r AS text_right,
                   lang_l AS lang_left, lang_r AS lang_right,
                   cluster_l AS cluster_id_left, cluster_r AS cluster_id_right, label
            FROM labeled
        """,
        # imbalanced totals mode: per-cluster quotas ceil(20/50)=1 pos /
        # ceil(380/50)=8 neg (sf0.01: 500 docs -> 50 clusters of 10 —
        # the correctness gate's fixed scale), then seeded global takes
        # (md5 seeds 144/145) down to the exact 20/380 totals
        "benchmark_imbalanced": f"""
            WITH base AS (
              SELECT doc_id AS id, text, lang, (doc_id // 10) AS cluster,
                     CASE WHEN lang = 'zh'
                          THEN list_transform(
                                 generate_series(1, greatest(len(text) - 1, 1)),
                                 i -> substring(text, i, 2))
                          ELSE {toks} END AS tokens
              FROM documents),
            pos_all AS (
              SELECT a.id AS id_l, b.id AS id_r, a.text AS text_l, b.text AS text_r,
                     a.lang AS lang_l, b.lang AS lang_r,
                     a.cluster AS cluster_l, b.cluster AS cluster_r,
                     CASE WHEN len(list_distinct(list_concat(a.tokens, b.tokens))) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(list_concat(a.tokens, b.tokens)))
                     END AS jac
              FROM base a JOIN base b ON a.cluster = b.cluster AND a.id < b.id),
            pos_sel AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_l
                            ORDER BY jac ASC, id_l ASC, id_r ASC) AS rn_hard
                FROM pos_all) WHERE rn_hard <= 1),
            positives AS (
              SELECT * FROM pos_sel
              ORDER BY md5('144#' || id_l::VARCHAR || '#' || id_r::VARCHAR) ASC,
                       id_l ASC, id_r ASC
              LIMIT 20),
            profiles AS (
              SELECT cluster, list_sort(list_distinct(flatten(list(tokens)))) AS profile
              FROM base GROUP BY cluster),
            inv AS (SELECT cluster, len(profile) AS s, unnest(profile) AS tok
                    FROM profiles),
            sims AS (
              SELECT c_a, c_b FROM (
                SELECT c_a, c_b, row_number() OVER (PARTITION BY c_a
                         ORDER BY (inter::DOUBLE / (s_a + s_b - inter)) DESC, c_b ASC)
                         AS sim_rank
                FROM (
                  SELECT a.cluster AS c_a, b.cluster AS c_b, a.s AS s_a, b.s AS s_b,
                         count(*) AS inter
                  FROM inv a JOIN inv b ON a.tok = b.tok AND a.cluster <> b.cluster
                  GROUP BY 1, 2, 3, 4))
              WHERE sim_rank <= 3),
            neg_all AS (
              SELECT a.id AS id_l, b.id AS id_r, a.text AS text_l, b.text AS text_r,
                     a.lang AS lang_l, b.lang AS lang_r,
                     a.cluster AS cluster_l, b.cluster AS cluster_r,
                     CASE WHEN len(list_distinct(list_concat(a.tokens, b.tokens))) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(list_concat(a.tokens, b.tokens)))
                     END AS jac
              FROM base a JOIN sims s ON a.cluster = s.c_a
              JOIN base b ON b.cluster = s.c_b
              WHERE a.id < b.id),
            neg_ranked AS (
              SELECT *, row_number() OVER (PARTITION BY cluster_l
                          ORDER BY jac DESC, id_l ASC, id_r ASC) AS rn_hard
              FROM neg_all),
            neg_hard AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM neg_ranked WHERE rn_hard <= 4),
            neg_rand AS (
              SELECT id_l, id_r, text_l, text_r, lang_l, lang_r, cluster_l, cluster_r
              FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_l
                            ORDER BY md5('143#' || id_l::VARCHAR || '#' || id_r::VARCHAR)
                                       ASC, id_l ASC, id_r ASC) AS rn_rand
                FROM neg_ranked WHERE rn_hard > 4)
              WHERE rn_rand <= 4),
            negatives AS (
              SELECT DISTINCT * FROM
                (SELECT * FROM neg_hard UNION ALL SELECT * FROM neg_rand)
              ORDER BY md5('145#' || id_l::VARCHAR || '#' || id_r::VARCHAR) ASC,
                       id_l ASC, id_r ASC
              LIMIT 380),
            labeled AS (
              SELECT *, 1 AS label FROM positives
              UNION ALL SELECT *, 0 AS label FROM negatives)
            SELECT id_l AS url_left, id_r AS url_right,
                   text_l AS text_left, text_r AS text_right,
                   lang_l AS lang_left, lang_r AS lang_right,
                   cluster_l AS cluster_id_left, cluster_r AS cluster_id_right, label
            FROM labeled
        """,
        "m7_pairwise_prf": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label
                       FROM embeddings WHERE vec_id < 200),
            p AS (
              SELECT (a.label = b.label)::INT AS label,
                     (round(list_dot_product(a.emb, b.emb)
                       / (sqrt(list_dot_product(a.emb, a.emb))
                          * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.15)::INT
                       AS prediction
              FROM e a JOIN e b ON a.vec_id < b.vec_id),
            agg AS (
              -- ::BIGINT: DuckDB sum() yields HUGEINT -> pandas float64, which
              -- hash-mismatches Spark's int64 even when values are identical.
              SELECT sum(CASE WHEN prediction = 1 AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN prediction = 1 AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN prediction = 0 AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn
              FROM p)
            SELECT tp, fp, fn,
                   round(tp / (tp + fp), 6) AS precision,
                   round(tp / (tp + fn), 6) AS recall
            FROM agg
        """,
    }
    # IVF with exhaustive probe is exactly brute force (every inverted
    # list probed), so it shares the ann_topk oracle verbatim — see
    # q_ann_ivf_topk's docstring.
    sqls["ann_ivf_topk"] = sqls["ann_topk"]
    sqls["ann_lsh_topk"] = _ann_lsh_oracle_sql(bands=8, rows=3, probe_bits=1, k=3)
    return sqls


def _ann_lsh_oracle_sql(bands: int, rows: int, probe_bits: int, k: int) -> str:
    """DuckDB oracle for q_ann_lsh_topk: rebuilds the banded hyperplane
    bucket keys from the SAME deterministic blake2b plane coefficients
    (embedded as double literals), applies the identical XOR probe
    ball, and exact-cosine re-ranks within the identical candidate
    union — the simhash md5-codegen move applied to hyperplane LSH.

    Bit-exactness of the sign decisions does not require identical
    summation order: the minimum |projection| over the test corpora is
    ~3.7e-5 while numpy-matmul vs DuckDB list_dot_product disagree by
    <1e-15, so every (vector, plane) sign bit — hence every band key,
    candidate set, and rank — is engine-independent."""
    from itertools import combinations

    from ember_spark.functions.hashing import plane_matrix

    m = plane_matrix(bands * rows, 64)  # (dim, planes), same as Spark UDF

    def plane_lit(p: int) -> str:
        # repr(float(v)), not repr(v): numpy >= 2.0 changed scalar repr
        # to 'np.float64(0.5)', which is not SQL; float() round-trips
        # the exact double either way
        return "[" + ",".join(repr(float(v)) for v in m[:, p]) + "]::DOUBLE[]"

    key_exprs = []
    for b in range(bands):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, {plane_lit(b * rows + j)}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(rows)
        )
        key_exprs.append(f"({bits}) AS k{b}")
    band_union = "\n              UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, k{b} AS key FROM kc" for b in range(bands)
    )
    masks = [0] + [
        sum(1 << i for i in combo)
        for r in range(1, min(probe_bits, rows) + 1)
        for combo in combinations(range(rows), r)
    ]
    flips = ",".join(f"({f})" for f in masks)
    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        kc AS (SELECT vec_id, {", ".join(key_exprs)} FROM c),
        cb AS ({band_union}),
        qb AS (SELECT vec_id AS query_id, band, xor(key, fl.f) AS key
               FROM cb, (VALUES {flips}) fl(f) WHERE vec_id < 20),
        cand AS (SELECT DISTINCT q.query_id, cc.vec_id AS neighbor_id
                 FROM qb q JOIN cb cc ON q.band = cc.band AND q.key = cc.key
                 WHERE q.query_id <> cc.vec_id),
        s AS (SELECT cand.query_id, cand.neighbor_id,
                     list_dot_product(qe.e, ce.e)
                       / (sqrt(list_dot_product(qe.e, qe.e))
                          * sqrt(list_dot_product(ce.e, ce.e))) AS cos_raw
              FROM cand
              JOIN c qe ON qe.vec_id = cand.query_id
              JOIN c ce ON ce.vec_id = cand.neighbor_id),
        r AS (SELECT query_id, neighbor_id, cos_raw,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos_raw DESC, neighbor_id ASC)
                       AS rank
              FROM s)
        SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS cos
        FROM r WHERE rank <= {k}
    """
