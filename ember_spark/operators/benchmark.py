"""Distributed labeled-benchmark construction.

Reproduces the reference's benchmark-building dataflow
(`build_ali_dataset.py:60-360`) as pure DataFrame jobs — the reference
loops clusters in pandas on one machine; this version is the same
semantics over keyed joins + windows and scales with the cluster:

- positives (`build_positive_pairs`, ref :60-130): within-cluster
  record pairs (J1 equi-join on the cluster key); the hard half =
  LEAST-similar by token Jaccard (T1 ascending window, ref :106-111),
  the random half a seeded-md5 sample of the remaining candidates (T4
  deterministic sampling analog of `DataFrame.sample`),
- negatives (`build_negative_pairs`, ref :133-217): candidates are
  records of the top-N most-similar clusters (`SIMILAR_CLUSTER_NUM=12`,
  ref :36,158-172) — cluster profiles are a token-union aggregate (A3),
  profile similarity comes from an INVERTED token INDEX equi-join (no
  O(C^2) cluster loop); the hard half = MOST-similar record pairs
  (descending-Jaccard window, ref :185-193), the random half a
  seeded-md5 sample of the remaining similar-cluster candidates,
- cross-corpus mode (ref pos_corpus/neg_corpus, :62,70,140): left side
  from `records`, right side from `right_records` — the RL scenario's
  main-records x new-records pairing,
- total-count mode (ref total_num, :72-76,125-127): per-cluster counts
  = ceil(total / num_clusters), then a global seeded top-`total` —
  orderBy+limit is a distributed TakeOrdered, never a single-partition
  window,
- exclusion (ref excluded_pairs, :87-97): anti-join on the pair key
  before ranking (J3),
- `build_benchmark_suite` (ref `build_datasets`, :260-343): the full
  10-dataset product — cluster split 250 main / 100 new, record split
  60/40 inside main clusters, train/val/test 7:1:2, RL/CFM/OM scenario
  tests, and the four 1:99 imbalanced variants.

Every join is a hash equi-join on (cluster key | token); no crossJoin
anywhere. Deviation from the reference, documented: pairs are
canonicalized (id_l < id_r in self mode), so mirrored duplicates the
pandas cross-merge can emit never appear. Output is the ember pair
schema (url_left/right, text_left/right, lang_left/right,
cluster_id_left/right, label) used by `ERPipeline.fit_matcher`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ember_spark.functions.similarity import token_jaccard
from ember_spark.functions.tokenize import tokenize_auto

PAIR_COLS = [
    "id_l", "id_r", "text_l", "text_r", "lang_l", "lang_r",
    "cluster_l", "cluster_r",
]


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
    per cluster (op A3 — the reference's cluster text profile,
    `union_tokenized_title`, build_ali_dataset.py:110-112)."""
    return (
        records.select(F.col(cluster_col).alias("cluster_id"), F.col(tokens_col).alias("t"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list("t")))).alias("profile"))
        .withColumn("profile_size", F.size("profile"))
    )


def similar_clusters(
    profiles: DataFrame,
    right_profiles: DataFrame | None = None,
    top_n: int = 12,
    max_token_df: int | str | None = "auto",
) -> DataFrame:
    """Top-N most-similar clusters per cluster by profile Jaccard
    (reference hard-negative mining, `build_ali_dataset.py:158-172`).
    With `right_profiles`, similarity is left-cluster vs right-corpus
    clusters (the cross-corpus scenario modes).

    Inverted-index join: explode profile tokens, equi-join on the token,
    count shared tokens per (a, b), Jaccard from profile sizes. Tokens
    present in more than `max_token_df` clusters are dropped from the
    index (hot-token guard — a token in d clusters creates d^2 candidate
    pairs while adding ~no discrimination; an unguarded ubiquitous token
    makes the join quadratic in the cluster count). The default "auto"
    derives the cap from a census of the profile table:
    max(100, ceil(5*sqrt(C))) for C clusters — inactive exactly when
    C <= 100 (cap >= C, nothing dropped: small-fixture results are
    unchanged) and sub-quadratic per token at scale (each hot token
    contributes <= cap^2 = max(10^4, 25*C) pairs instead of C^2; the
    census itself is one count()). Pass an int to pin the cap (the
    oracle-checked benchmark queries pin 60; `build_benchmark_suite`
    resolves "auto" ONCE from its known cluster bound rather than
    paying a census per sub-dataset) or None to disable.
    Returns (cluster_id, sim_cluster, sim_jaccard, sim_rank),
    directed, a != b.
    """
    if max_token_df == "auto":
        n_clusters = profiles.count()
        if right_profiles is not None:
            n_clusters = max(n_clusters, right_profiles.count())
        max_token_df = max(100, math.ceil(5 * math.sqrt(n_clusters)))

    def _inv(p: DataFrame) -> DataFrame:
        inv = p.select(
            F.col("cluster_id"), F.col("profile_size"), F.explode("profile").alias("tok")
        )
        if max_token_df:
            w_tok = Window.partitionBy("tok")
            inv = (
                inv.withColumn("_df", F.count(F.lit(1)).over(w_tok))
                .filter(F.col("_df") <= max_token_df)
                .drop("_df")
            )
        return inv

    inv_l = _inv(profiles)
    inv_r = _inv(right_profiles) if right_profiles is not None else inv_l
    a = inv_l.select(
        F.col("tok"),
        F.col("cluster_id").alias("c_a"),
        F.col("profile_size").alias("s_a"),
    )
    b = inv_r.select(
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


def _prep_base(records, id_col, text_col, lang_col, cluster_col) -> DataFrame:
    return records.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
        F.col(cluster_col).alias("cluster"),
        tokenize_auto(F.col(text_col), F.col(lang_col)).alias("tokens"),
    )


def _sides(base: DataFrame, suf: str) -> DataFrame:
    return base.select(
        F.col("id").alias(f"id_{suf}"),
        F.col("text").alias(f"text_{suf}"),
        F.col("lang").alias(f"lang_{suf}"),
        F.col("cluster").alias(f"cluster_{suf}"),
        F.col("tokens").alias(f"tokens_{suf}"),
    )


def _exclude(cands: DataFrame, exclude_pairs: DataFrame | None) -> DataFrame:
    """Anti-join out previously-used pairs (ref excluded_pairs,
    build_ali_dataset.py:87-97) — both orientations, so a canonical
    exclusion list kills mirrored candidates too."""
    if exclude_pairs is None:
        return cands
    ex = exclude_pairs.select(
        F.col(exclude_pairs.columns[0]).alias("id_l"),
        F.col(exclude_pairs.columns[1]).alias("id_r"),
    )
    ex = ex.unionByName(ex.select(F.col("id_r").alias("id_l"), F.col("id_l").alias("id_r")))
    return cands.join(ex, ["id_l", "id_r"], "left_anti")


def _hard_random_split(
    cands: DataFrame,
    n_per_cluster: int,
    hard_order: list[F.Column],
    seed: int,
) -> DataFrame:
    """The reference's per-cluster sampling shape (:106-124,:185-204):
    rank candidates by `hard_order`, take ceil(n/2) hard, then a
    seeded-md5 sample of floor(n/2) from the remainder."""
    n_hard = n_per_cluster // 2 + n_per_cluster % 2
    n_rand = n_per_cluster // 2
    w_hard = Window.partitionBy("cluster_l").orderBy(
        *hard_order, F.col("id_l").asc(), F.col("id_r").asc()
    )
    ranked = cands.withColumn("rn_hard", F.row_number().over(w_hard))
    hard = ranked.filter(F.col("rn_hard") <= n_hard)
    w_rand = Window.partitionBy("cluster_l").orderBy(
        _md5_order(seed, "id_l", "id_r").asc(), F.col("id_l").asc(), F.col("id_r").asc()
    )
    rand = (
        ranked.filter(F.col("rn_hard") > n_hard)
        .withColumn("rn_rand", F.row_number().over(w_rand))
        .filter(F.col("rn_rand") <= n_rand)
    )
    return hard.select(*PAIR_COLS).unionByName(rand.select(*PAIR_COLS))


def _global_take(pairs: DataFrame, total: int, seed: int) -> DataFrame:
    """Reference total_num mode's final `sample(n=total)` (:125-127) —
    a seeded global top-k; orderBy+limit plans as TakeOrdered (per-
    partition top-k then merge), safe at any scale."""
    return (
        pairs.orderBy(
            _md5_order(seed, "id_l", "id_r").asc(),
            F.col("id_l").asc(),
            F.col("id_r").asc(),
        ).limit(total)
    )


def build_benchmark_pairs(
    records: DataFrame,
    right_records: DataFrame | None = None,
    id_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
    cluster_col: str = "cluster_id",
    pairs_per_cluster: int = 40,
    neg_per_cluster: int | None = None,
    top_similar: int = 12,
    seed: int = 142,
    exclude_pairs: DataFrame | None = None,
    total_pos: int | None = None,
    total_neg: int | None = None,
    max_token_df: int | str | None = "auto",
) -> DataFrame:
    """Ember-shaped labeled pair benchmark, fully distributed.

    Per cluster: up to `pairs_per_cluster` positives and up to
    `neg_per_cluster` negatives (default 3x positives, the reference's
    1:3 ratio); each split half hard / half seeded-random per the
    reference's sampling shape. With `right_records` the pair's right
    side comes from that corpus (scenario modes); with
    `total_pos`/`total_neg` per-cluster counts are derived as
    ceil(total/num_clusters) and a final global seeded take enforces the
    exact totals (the reference's imbalanced 500:49500 mode).
    Deterministic in (seed): every sampling step is a window over a
    seeded md5 sort key, so the same job on the same input yields
    byte-identical pairs on any cluster.
    """
    base_l = _prep_base(records, id_col, text_col, lang_col, cluster_col)
    cross = right_records is not None
    base_r = (
        _prep_base(right_records, id_col, text_col, lang_col, cluster_col)
        if cross
        else base_l
    )

    if total_pos is not None or total_neg is not None:
        # ref :72-76 — per-cluster quota from the LEFT corpus's cluster
        # count; one tiny driver-side action, same as the reference's
        n_clusters = base_l.select("cluster").distinct().count()
        # a clusterless corpus (e.g. an empty 'extra' split when the
        # input had fewer qualifying clusters than the suite's split
        # sizes) has no pairs: zero quotas let the empty dataflow
        # produce the correctly-typed empty result instead of raising
        # ZeroDivisionError on the quota derivation
        if total_pos is not None:
            pairs_per_cluster = (
                math.ceil(total_pos / n_clusters) if n_clusters else 0
            )
        if total_neg is not None:
            neg_per_cluster = (
                math.ceil(total_neg / n_clusters) if n_clusters else 0
            )
    neg_per_cluster = (
        neg_per_cluster if neg_per_cluster is not None else 3 * pairs_per_cluster
    )

    # pair canonicalization: self mode orders ids (no mirrored dupes);
    # cross mode keeps (left, right) orientation like the reference
    pair_guard = (
        (F.col("id_l") != F.col("id_r")) if cross else (F.col("id_l") < F.col("id_r"))
    )

    # ---------------- positives: within-cluster pairs, hard + random
    pos_all = (
        _sides(base_l, "l")
        .join(_sides(base_r, "r"), F.col("cluster_l") == F.col("cluster_r"))
        .filter(pair_guard)
        .withColumn("jac", token_jaccard(F.col("tokens_l"), F.col("tokens_r")))
    )
    pos_all = _exclude(pos_all, exclude_pairs)
    positives = _hard_random_split(
        pos_all, pairs_per_cluster, [F.col("jac").asc()], seed
    )
    if total_pos is not None:
        positives = _global_take(positives, total_pos, seed + 2)

    # ---------------- negatives: top-N similar clusters, hard + random
    profiles_l = cluster_profiles(base_l, "cluster", "tokens")
    profiles_r = cluster_profiles(base_r, "cluster", "tokens") if cross else None
    sims = similar_clusters(
        profiles_l, profiles_r, top_n=top_similar, max_token_df=max_token_df
    )
    neg_all = (
        _sides(base_l, "l")
        .join(sims, F.col("cluster_l") == F.col("cluster_id"))
        .join(_sides(base_r, "r"), F.col("sim_cluster") == F.col("cluster_r"))
        .filter(pair_guard)
        .withColumn("jac", token_jaccard(F.col("tokens_l"), F.col("tokens_r")))
    )
    neg_all = _exclude(neg_all, exclude_pairs)
    # hard negatives = MOST-similar pairs (ref sorts descending, :193)
    negatives = _hard_random_split(
        neg_all, neg_per_cluster, [F.col("jac").desc()], seed + 1
    )
    # self mode can emit (a,b) from a's window and (b,a)->(a,b) from b's
    negatives = negatives.dropDuplicates(["id_l", "id_r"])
    if total_neg is not None:
        negatives = _global_take(negatives, total_neg, seed + 3)

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


# ---------------------------------------------------------------- suite


def split_clusters(
    records: DataFrame,
    cluster_col: str = "cluster_id",
    n_main: int = 250,
    n_extra: int = 100,
    min_cluster_size: int = 10,
    seed: int = 142,
) -> DataFrame:
    """(cluster_id, cluster_split in {'main','extra'}): drop clusters
    below `min_cluster_size` (ref build_ali_dataset.py:355-358), then a
    seeded deterministic sample of n_main + n_extra clusters split
    main/extra (ref CLUSTER_SIZE_SPLIT 250/100, :26,261-268). The
    'extra' clusters are the OM scenario's unseen clusters."""
    sizes = (
        records.groupBy(F.col(cluster_col).alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_cluster_size)
    )
    # two-phase: the seeded orderBy+limit plans as a DISTRIBUTED
    # TakeOrdered (per-partition top-k, then merge) — a bare global
    # row_number window would funnel EVERY cluster through one task.
    # Only the selected n_main+n_extra rows (a few hundred) then pass
    # through the single-partition ranking window, which reproduces the
    # same total order, so the main/extra labels are identical. This is
    # the one site that emits Spark's "WindowExec: No Partition Defined"
    # warning — expected and bounded: the window's input is capped at
    # n_main+n_extra rows by the limit() above, so the single partition
    # holds a few hundred rows at ANY corpus scale, never the corpus.
    selected = sizes.orderBy(
        _md5_order(seed, "cluster_id").asc(), F.col("cluster_id").asc()
    ).limit(n_main + n_extra)
    ordered = selected.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(
                _md5_order(seed, "cluster_id").asc(), F.col("cluster_id").asc()
            )
        ),
    )
    return ordered.select(
        "cluster_id",
        F.when(F.col("rn") <= n_main, F.lit("main")).otherwise(F.lit("extra")).alias(
            "cluster_split"
        ),
    )


def split_records(
    records: DataFrame,
    id_col: str = "url",
    cluster_col: str = "cluster_id",
    frac_extra: float = 0.4,
    seed: int = 142,
) -> DataFrame:
    """Adds `record_split` in {'main','extra'}: a per-cluster seeded
    60/40 record split (ref RECORD_RADIO_SPLIT, :27,269-276). The
    'extra' records are the RL/CFM scenarios' unseen records."""
    w_cnt = Window.partitionBy(cluster_col)
    w_rn = Window.partitionBy(cluster_col).orderBy(
        _md5_order(seed + 10, id_col).asc(), F.col(id_col).asc()
    )
    # exact rational arithmetic (cnt * num / 10^6, long ops then one
    # exact double division) so the DuckDB oracle computes the identical
    # boundary — cnt * (1.0 - frac) would sit one ulp off an integer
    num = int(round((1.0 - frac_extra) * 1_000_000))
    n_main = F.ceil(F.count(F.lit(1)).over(w_cnt) * F.lit(num) / F.lit(1_000_000))
    return (
        records.withColumn("_rn", F.row_number().over(w_rn))
        .withColumn(
            "record_split",
            F.when(F.col("_rn") <= n_main, F.lit("main")).otherwise(F.lit("extra")),
        )
        .drop("_rn")
    )


def split_train_val_test(
    pairs: DataFrame, seed: int = 142
) -> dict[str, DataFrame]:
    """7:1:2 split of a pair table by seeded hash of the pair key (the
    T6 hash-split analog of the reference's train_test_split, :295-297).
    Disjoint and exhaustive by construction."""
    b = F.pmod(
        F.xxhash64(F.lit(seed), F.col("url_left"), F.col("url_right")), F.lit(10)
    )
    tagged = pairs.withColumn("_b", b)
    return {
        "train": tagged.filter(F.col("_b") < 7).drop("_b"),
        "val": tagged.filter(F.col("_b") == 7).drop("_b"),
        "test": tagged.filter(F.col("_b") > 7).drop("_b"),
    }


def build_benchmark_suite(
    records: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
    cluster_col: str = "cluster_id",
    n_main_clusters: int = 250,
    n_extra_clusters: int = 100,
    min_cluster_size: int = 10,
    record_frac_extra: float = 0.4,
    num_pairs: int = 40,
    rl_num_pairs: int = 8,
    om_num_pairs: int = 20,
    imbalance_pos: int = 500,
    imbalance_neg: int = 49500,
    top_similar: int = 12,
    seed: int = 142,
    max_token_df: int | str | None = "auto",
) -> dict[str, DataFrame]:
    """The reference's full 10-dataset benchmark product
    (`build_datasets`, build_ali_dataset.py:260-343), distributed:

    train/val/test — 7:1:2 over `num_pairs`-per-cluster pairs among MAIN
    records of MAIN clusters; test_rl — main x extra records (unseen
    record linked against seen ones); test_cfm — extra x extra records
    (both unseen); test_om — pairs inside the extra (unseen) clusters;
    test_i / test_irl / test_icfm / test_iom — the same four, rebuilt at
    the 1:99 imbalanced totals (ref IMBALANCE_POS_NEG_SIZE, :30), with
    test_i excluding every train/val pair (:311-315).

    num_pairs counts TOTAL pairs per cluster at the reference's 1:3
    pos:neg ratio (NUM_PAIRS=40 -> 10 pos + 30 neg, :224-229).
    """
    if max_token_df == "auto":
        # the suite's cluster count is bounded by construction
        # (n_main + n_extra sampled clusters) — resolve the hot-token
        # cap once here instead of running a census Spark job inside
        # each of the 8+ build_benchmark_pairs calls below
        bound = n_main_clusters + n_extra_clusters
        max_token_df = max(100, math.ceil(5 * math.sqrt(bound)))
    csplit = split_clusters(
        records, cluster_col, n_main_clusters, n_extra_clusters,
        min_cluster_size, seed,
    )
    tagged = records.join(
        csplit, records[cluster_col] == csplit["cluster_id"], "inner"
    ).drop(csplit["cluster_id"])
    main_cl = tagged.filter(F.col("cluster_split") == "main").drop("cluster_split")
    extra_cl = tagged.filter(F.col("cluster_split") == "extra").drop("cluster_split")
    rsplit = split_records(main_cl, id_col, cluster_col, record_frac_extra, seed)
    main_rec = rsplit.filter(F.col("record_split") == "main").drop("record_split")
    extra_rec = rsplit.filter(F.col("record_split") == "extra").drop("record_split")

    def pairs(left, right=None, per_cluster=None, totals=None, exclude=None, s=seed):
        pos_pc = neg_pc = total_pos = total_neg = None
        if per_cluster is not None:
            pos_pc, neg_pc = per_cluster // 4, per_cluster // 4 * 3
        if totals is not None:
            total_pos, total_neg = totals
        return build_benchmark_pairs(
            left, right_records=right,
            id_col=id_col, text_col=text_col, lang_col=lang_col,
            cluster_col=cluster_col,
            pairs_per_cluster=pos_pc if pos_pc is not None else 1,
            neg_per_cluster=neg_pc,
            top_similar=top_similar, seed=s, exclude_pairs=exclude,
            total_pos=total_pos, total_neg=total_neg,
            max_token_df=max_token_df,
        )

    dataset = pairs(main_rec, per_cluster=num_pairs)
    tvt = split_train_val_test(dataset, seed)
    train_val = tvt["train"].unionByName(tvt["val"]).select("url_left", "url_right")

    imb = (imbalance_pos, imbalance_neg)
    return {
        **tvt,
        "test_rl": pairs(main_rec, right=extra_rec, per_cluster=rl_num_pairs, s=seed + 20),
        "test_cfm": pairs(extra_rec, per_cluster=rl_num_pairs, s=seed + 30),
        "test_om": pairs(extra_cl, per_cluster=om_num_pairs, s=seed + 40),
        "test_i": pairs(main_rec, totals=imb, exclude=train_val, s=seed + 50),
        "test_irl": pairs(main_rec, right=extra_rec, totals=imb, s=seed + 60),
        "test_icfm": pairs(extra_rec, totals=imb, s=seed + 70),
        "test_iom": pairs(extra_cl, totals=imb, s=seed + 80),
    }
