"""Blocking: candidate-pair generation via exact keys + MinHash-LSH.

Replaces the reference's blocked cartesian (op J1, per-cluster pandas
cross-merge `build_ali_dataset.py:80-87`) and its "similar cluster"
hard-negative join (J2, `:158-172`) with scale-honest equi-joins:

- exact block keys (normalized domain / category / fingerprint),
- MinHash-LSH band keys over token shingles (J2's near-neighbor
  semantics without the O(C^2) cluster loop),
- block-size census (A1) + hot-block capping (skew control BEFORE the
  join — AQE skew-join stays on only as a backstop),
- canonical pair order id_l < id_r (op F4) + dedup across keys.

All joins are hash equi-joins on the block key; no crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ember_spark.functions.hashing import lsh_band_keys, make_minhash_sig_udf

#: blocks larger than this emit no pairs (quadratic blowup guard);
#: at web scale a hot shingle/domain block is almost always boilerplate.
DEFAULT_BLOCK_CAP = 2000


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently has fewer
    partitions than the session's parallelism.

    A CPU-heavy projection (tokenize/shingle/MinHash/Arrow UDF)
    inherits the scan's partitioning; a small single-file input then
    serializes the whole stage onto one core (driver bench r2/r3: 9s+
    of one-core interpreted-HOF work behind a 594KB parquet). At
    production scale the scan already has file-granularity partitions
    >> cores, so this is a no-op there — the repartition only fires on
    narrow inputs, where shuffling the raw rows costs microseconds
    against the compute it parallelizes."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def block_census(keys: DataFrame, key_col: str = "block_key") -> DataFrame:
    """Block-size census (op A1): rows per block key."""
    return keys.groupBy(key_col).agg(F.count(F.lit(1)).alias("block_size"))


def cap_hot_blocks(
    keys: DataFrame, key_col: str = "block_key", cap: int = DEFAULT_BLOCK_CAP
) -> DataFrame:
    """Drop keys whose block exceeds `cap` rows. One window count over
    a single shuffle on the key — no census join, and the output stays
    hash-partitioned by the key so the following self-join reuses the
    partitioning. Blocks of size 1 produce no pairs and are dropped
    too, shrinking the self-join input.
    """
    w = Window.partitionBy(key_col)
    return (
        keys.withColumn("_bs", F.count(F.lit(1)).over(w))
        .filter((F.col("_bs") >= 2) & (F.col("_bs") <= cap))
        .drop("_bs")
    )


def _pairs_from_keys(
    keys: DataFrame, id_col: str, key_col: str, materialize: bool = True
) -> DataFrame:
    """Self equi-join on the block key, canonicalized id_l < id_r.

    With materialize=True the input lineage is materialized once
    (localCheckpoint): a self-join scans its input twice, and for LSH
    keys derived from raw tokens that input embeds the signature
    computation. Pass materialize=False when the upstream is already
    cached/cheap (e.g. precomputed signature column).
    """
    keys = keys.select(F.col(key_col), F.col(id_col))
    if materialize:
        # EAGER on purpose: the self-join scans this table from two legs
        # concurrently; a lazy checkpoint makes wide-parallelism tasks
        # convoy on block-store locks while holding execution slots
        # (measured: +30-100% wall on the 5M-pair stage at 8 cores).
        # One dedicated materialization job is cheaper.
        keys = keys.localCheckpoint()
    left = keys.select(F.col(key_col), F.col(id_col).alias("id_l"))
    right = keys.select(F.col(key_col), F.col(id_col).alias("id_r"))
    return (
        left.join(right, key_col)
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
    )


def exact_key_pairs(
    df: DataFrame,
    id_col: str,
    key_expr,
    cap: int = DEFAULT_BLOCK_CAP,
    dedup: bool = True,
) -> DataFrame:
    """Candidate pairs sharing an exact block key (e.g. normalized
    domain). `key_expr` is a Column producing the key."""
    keys = df.select(F.col(id_col), key_expr.alias("block_key")).filter(
        F.col("block_key").isNotNull()
    )
    keys = cap_hot_blocks(keys, "block_key", cap)
    out = _pairs_from_keys(keys, id_col, "block_key")
    return out.dropDuplicates(["id_l", "id_r"]) if dedup else out


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str | None = None,
    num_hashes: int = 32,
    bands: int = 16,
    rows: int = 2,
    cap: int = DEFAULT_BLOCK_CAP,
    sig_col: str | None = None,
    materialize: bool = True,
    dedup: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs.

    Either `tokens_col` (signature computed here via the Arrow-batched
    numpy MinHash — the JVM HOF min-agg is interpreted and slower) or
    `sig_col` (precomputed array<long> signature, e.g. from
    `make_prepare_udf`'s single Arrow pass) must be given. Pipeline:
    signature -> band keys -> posexplode -> census-capped self-join per
    band bucket -> canonical dedup'd (id_l, id_r).

    With bands=16, rows=2: P(collide | s) = 1-(1-s^2)^16 — ≈0.99 at
    s=0.5, ≈1-1e-7 at s=0.8. Tune per recall target (SURVEY.md §7.3).
    """
    assert bands * rows <= num_hashes
    if sig_col is not None:
        # empty docs carry an all-MAX sentinel signature -> drop
        sig = df.filter(
            F.element_at(F.col(sig_col), 1) != F.lit((1 << 63) - 1)
        ).select(F.col(id_col), F.col(sig_col).alias("sig"))
    else:
        sig_udf = make_minhash_sig_udf(num_hashes)
        sig = df.filter(F.size(F.col(tokens_col)) > 0).select(
            F.col(id_col),
            sig_udf(F.col(tokens_col)).alias("sig"),
        )
    banded = sig.select(
        F.col(id_col),
        F.posexplode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band", "band_hash"),
    ).select(
        F.col(id_col),
        # band id is already baked into band_hash's seed; a single long
        # key keeps the shuffle narrow
        F.col("band_hash").alias("block_key"),
    )
    banded = cap_hot_blocks(banded, "block_key", cap)
    out = _pairs_from_keys(banded, id_col, "block_key", materialize=materialize)
    # callers that union more key sources (candidate_pairs) dedup ONCE
    # at the end — a second full shuffle of the biggest table otherwise
    return out.dropDuplicates(["id_l", "id_r"]) if dedup else out


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str | None = None,
    exact_key_exprs: list | None = None,
    num_hashes: int = 32,
    bands: int = 16,
    rows: int = 2,
    cap: int = DEFAULT_BLOCK_CAP,
    sig_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Multi-key blocking: union of LSH pairs and exact-key pairs,
    deduplicated on the canonical (id_l, id_r)."""
    out = lsh_candidate_pairs(
        df,
        id_col,
        tokens_col,
        num_hashes=num_hashes,
        bands=bands,
        rows=rows,
        cap=cap,
        sig_col=sig_col,
        materialize=materialize,
        dedup=False,
    )
    for key_expr in exact_key_exprs or []:
        out = out.unionByName(
            exact_key_pairs(df, id_col, key_expr, cap=cap, dedup=False)
        )
    return out.dropDuplicates(["id_l", "id_r"])


def hot_pair_key_fracs(pairs: DataFrame) -> dict[str, float]:
    """One-job census of the pair table's hottest id on EACH side:
    {'id_l': frac, 'id_r': frac} where frac is the share of pairs the
    single hottest key holds. Both groupBys are map-side combinable;
    callers should census a persisted pair table (the pipeline's is)."""
    rows = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.lit("id_l").alias("s"), F.col("id_l").alias("k")),
                    F.struct(F.lit("id_r").alias("s"), F.col("id_r").alias("k")),
                )
            ).alias("x")
        )
        .groupBy("x.s", "x.k")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("s")
        .agg(F.max("c").alias("mx"), F.sum("c").alias("n"))
        .collect()
    )
    return {r["s"]: (r["mx"] / r["n"] if r["n"] else 0.0) for r in rows}


def hot_pair_keys(
    pairs: DataFrame, trigger_frac: float, n_pairs: int | None = None
) -> dict[str, list]:
    """One-job census of every id holding >= trigger_frac of the pairs
    on its side: {'id_l': [keys...], 'id_r': [keys...]}. The result is
    bounded by construction — at most 1/trigger_frac keys per side —
    so the collect is a handful of rows at any corpus scale. `n_pairs`
    skips the count() when the caller already knows it (the pipeline's
    pair table is persisted and counted at the block barrier)."""
    n = pairs.count() if n_pairs is None else n_pairs
    out: dict[str, list] = {"id_l": [], "id_r": []}
    if n == 0 or trigger_frac <= 0:
        return out
    thresh = trigger_frac * n
    rows = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.lit("id_l").alias("s"), F.col("id_l").alias("k")),
                    F.struct(F.lit("id_r").alias("s"), F.col("id_r").alias("k")),
                )
            ).alias("x")
        )
        .groupBy("x.s", "x.k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= F.lit(thresh))
        .collect()
    )
    for r in rows:
        out[r["s"]].append(r["k"])
    return out


def attach_pair_payload(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    payload_cols: list[str],
    broadcast_payload: bool | None = None,
    broadcast_max_rows: int = 2_000_000,
    salt: int = 0,
    salt_trigger_frac: float = 0.0,
    salt_hot_keys: dict[str, list] | None = None,
) -> DataFrame:
    """Join each side's payload columns onto canonical pairs with
    _l/_r suffixes.

    The pair table is usually an order of magnitude larger than the
    corpus, so shuffling it twice through sort-merge joins dominates
    scoring. When the (column-pruned) payload fits comfortably in
    memory we broadcast it — in local mode a single shared hash map,
    on a cluster one copy per executor. Beyond `broadcast_max_rows`
    the joins fall back to shuffle joins (at 10^12-doc scale the right
    answer is bucketing the corpus and pair table on the id — see
    README scale notes).

    Skew: with `salt > 1` the shuffle-join path spreads hot ids via
    `skew.salted_join` (fat pair table x compact payload — exactly its
    cost model: every pair row must survive, so `cap_hot_blocks` does
    not apply, and AQE cannot split a shuffled-hash join's single
    hottest task). With `salt_trigger_frac > 0` a one-job census
    (`hot_pair_keys`) first NAMES each side's hub ids (every id holding
    >= that fraction of pairs — a bounded list) and salts ONLY the rows
    carrying one, replicating ONLY the hubs' payload rows
    (`skew.salted_join_hot`); uniform keys keep the plain join and pay
    nothing beyond the census. `salt_trigger_frac == 0` replicates the
    whole payload side `salt` ways on both joins unconditionally.
    The salt is derived from the OTHER side's id, so a hot id_l's pairs
    spread by their id_r (deterministic, resumable).
    """
    if broadcast_payload is None:
        try:
            broadcast_payload = df.count() <= broadcast_max_rows
        except Exception:
            broadcast_payload = False
    left = df.select(F.col(id_col).alias("id_l"), *[F.col(c).alias(f"{c}_l") for c in payload_cols])
    right = df.select(F.col(id_col).alias("id_r"), *[F.col(c).alias(f"{c}_r") for c in payload_cols])
    if broadcast_payload:
        # a broadcast join has no reducer to skew — salting is moot
        return pairs.join(F.broadcast(left), "id_l").join(F.broadcast(right), "id_r")
    from ember_spark.operators.skew import salted_join, salted_join_hot

    if salt > 1 and salt_trigger_frac > 0:
        # census-gated HOT-KEY split (round 5): the census names the
        # hub ids (a bounded list — at most 1/trigger per side), only
        # rows carrying a hub id take the salted branch, and only the
        # hub ids' payload rows are replicated. Replicating the whole
        # compact side (salted_join) measured 2.7x the plain join's
        # wall on a 30%-hub table; the split costs plain + epsilon.
        # An EMPTY pair table yields no census rows: both lists come
        # back empty and salted_join_hot degrades to the plain joins.
        # `salt_hot_keys` skips the census when the caller already ran
        # it (one census, many attach calls over the same pair table).
        hot = (
            salt_hot_keys
            if salt_hot_keys is not None
            else hot_pair_keys(pairs, salt_trigger_frac)
        )
        mid = salted_join_hot(
            pairs, left, "id_l", hot["id_l"], salt=salt, salt_cols=["id_r"]
        )
        return salted_join_hot(
            mid, right, "id_r", hot["id_r"], salt=salt, salt_cols=["id_l"]
        )
    if salt > 1:
        # unconditional full-replication salting (salt_trigger_frac=0):
        # the right shape when MOST keys are hot or no census is wanted
        mid = salted_join(pairs, left, "id_l", salt=salt, salt_cols=["id_r"])
        return salted_join(mid, right, "id_r", salt=salt, salt_cols=["id_l"])
    return pairs.join(left, "id_l").join(right, "id_r")


def attach_pair_payload_bucketed(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    payload_cols: list[str],
    buckets: int = 64,
    table_prefix: str | None = None,
    location: str | None = None,
) -> DataFrame:
    """Bucketed variant of `attach_pair_payload` — the 10^12-pair scale
    path: corpus and pair table are written ONCE as bucketed+sorted
    tables on the id, so the first payload join runs bucket-to-bucket
    with NO exchange and NO sort on either side, and the corpus side of
    the second join is likewise exchange-free (only the already-slimmed
    intermediate reshuffles on id_r). On a real cluster the bucketed
    writes double as resumable stage outputs; a shuffle join instead
    re-exchanges the full pair table twice on every run.

    `table_prefix` defaults to a per-call unique name so concurrent jobs
    sharing a metastore can never clobber each other's bucketed tables
    (and a pre-existing unrelated table is never DROPped). Pass an
    explicit prefix to reuse tables across runs — then YOU own the
    namespace. Call `drop_bucketed_tables(spark, prefix)` once the join
    output has been consumed.
    """
    spark = df.sparkSession
    if table_prefix is None:
        import uuid

        table_prefix = f"ember_bucketed_{uuid.uuid4().hex[:12]}"
    corpus_tbl = f"{table_prefix}_corpus"
    pairs_tbl = f"{table_prefix}_pairs"
    for tbl, data, key in ((corpus_tbl, df.select(id_col, *payload_cols), id_col),
                           (pairs_tbl, pairs, "id_l")):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        w = data.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
        if location:
            w = w.option("path", f"{location}/{tbl}")
        w.saveAsTable(tbl)
    corpus = spark.table(corpus_tbl)
    p = spark.table(pairs_tbl)
    left = corpus.select(
        F.col(id_col).alias("id_l"), *[F.col(c).alias(f"{c}_l") for c in payload_cols]
    )
    right = corpus.select(
        F.col(id_col).alias("id_r"), *[F.col(c).alias(f"{c}_r") for c in payload_cols]
    )
    return p.join(left, "id_l").join(right, "id_r")


def drop_bucketed_tables(spark, table_prefix: str) -> None:
    """Drop the two tables `attach_pair_payload_bucketed` wrote under
    `table_prefix` once the join output has been consumed."""
    for suffix in ("corpus", "pairs"):
        spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_{suffix}")


def salted_repartition(
    df: DataFrame, key_col: str, row_col: str, partitions: int, salt: int = 8
) -> DataFrame:
    """Explicit repartition on (key, salt) — spreads a hot key across
    `salt` partitions before a wide stage (north_rule skew-key salting).
    The salt comes from a row-varying column (`row_col`, e.g. the pair
    id) so rows of one hot key land on `salt` different partitions.
    Used ahead of the scoring stage so one hot block key cannot pin a
    single task.
    """
    return df.repartition(
        partitions,
        F.concat(
            F.col(key_col).cast("string"),
            F.lit("#"),
            F.pmod(F.xxhash64(F.col(row_col)), F.lit(salt)).cast("string"),
        ),
    )
