"""Distributed labeled-benchmark builder (VERDICT r1 item 5): the
composed build_ali_dataset dataflow must (a) hold its labeling
invariants and (b) produce pairs that train the matcher to the same
F1 >= 0.99 gate as the driver-side fixture generator it replaces."""

import pytest
from pyspark.sql import functions as F

from ember_spark.evaluate import pairwise_prf
from ember_spark.fixtures import generate_labeled_pairs, generate_pages
from ember_spark.operators.benchmark import build_benchmark_pairs, similar_clusters, cluster_profiles
from ember_spark.plans.pipeline import ERPipeline
from tests.test_pipeline import _featurize


@pytest.fixture(scope="module")
def records(spark):
    pw = generate_pages(spark, 250, seed=142).select(
        "url", "text", "lang", "cluster_id"
    )
    pw.cache().count()
    return pw


@pytest.fixture(scope="module")
def bench_pairs(spark, records):
    bp = build_benchmark_pairs(records, pairs_per_cluster=6, neg_per_cluster=18, seed=142)
    bp.cache().count()
    return bp


def test_benchmark_label_invariants(spark, records, bench_pairs):
    """label == 1 iff same ground-truth cluster; pairs canonical and
    unique; per-cluster counts bounded by the targets."""
    rows = bench_pairs.collect()
    assert len(rows) == len({(r["url_left"], r["url_right"]) for r in rows})
    for r in rows:
        assert r["url_left"] < r["url_right"]
        same = r["cluster_id_left"] == r["cluster_id_right"]
        assert r["label"] == (1 if same else 0)
    # per-cluster positive cap
    per = (
        bench_pairs.filter("label = 1")
        .groupBy("cluster_id_left")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per <= 6


def test_benchmark_has_hard_negatives(spark, records, bench_pairs):
    """Hard negatives must come from genuinely similar clusters: the
    negatives mined from top-similar clusters (same family) must be
    markedly more similar than uniform random cross-cluster pairing
    — a RELATIVE assertion, robust to the fixture's document length."""
    from ember_spark.functions.similarity import token_jaccard
    from ember_spark.functions.tokenize import tokenize_auto

    neg = bench_pairs.filter("label = 0").withColumn(
        "jac",
        token_jaccard(
            tokenize_auto(F.col("text_left"), F.col("lang_left")),
            tokenize_auto(F.col("text_right"), F.col("lang_right")),
        ),
    )
    same_family = neg.filter(
        F.floor(F.col("cluster_id_left") / 8) == F.floor(F.col("cluster_id_right") / 8)
    )
    other = neg.filter(
        F.floor(F.col("cluster_id_left") / 8) != F.floor(F.col("cluster_id_right") / 8)
    )
    assert same_family.count() > 0
    m_hard = same_family.agg(F.avg("jac")).first()[0]
    m_rand = other.agg(F.avg("jac")).first()[0]
    assert m_hard > 2 * m_rand, (m_hard, m_rand)


def test_benchmark_trains_matcher_to_gate(spark, records, bench_pairs):
    """The distributed benchmark replaces fixtures.generate_labeled_pairs
    at scale — training on it must reach the same F1 >= 0.99 gate on the
    held-out seed-123 benchmark."""
    pipe = ERPipeline(spark)
    matcher = pipe.fit_matcher(bench_pairs)
    held_out = generate_labeled_pairs(spark, 200, seed=123)
    m = pairwise_prf(matcher.predict(_featurize(held_out)))
    assert m["f1"] >= 0.99, m


@pytest.fixture(scope="module")
def suite(spark, records):
    """Small-scale full 10-dataset suite (ref build_datasets):
    20 main + 8 new clusters, 60/40 record split, 8 pairs/cluster,
    1:19 imbalanced totals."""
    from ember_spark.operators.benchmark import build_benchmark_suite

    s = build_benchmark_suite(
        records,
        n_main_clusters=20,
        n_extra_clusters=8,
        min_cluster_size=4,
        num_pairs=8,
        rl_num_pairs=4,
        om_num_pairs=4,
        imbalance_pos=10,
        imbalance_neg=190,
        top_similar=3,
        seed=142,
    )
    return {k: df.cache() for k, df in s.items()}


def test_suite_has_all_reference_datasets(suite):
    assert set(suite) == {
        "train", "val", "test", "test_rl", "test_cfm", "test_om",
        "test_i", "test_irl", "test_icfm", "test_iom",
    }


def test_suite_split_disjointness(spark, records, suite):
    """main/extra clusters disjoint; RL pairs bridge main records (left)
    to extra records (right); OM pairs live entirely in extra clusters
    never seen by train."""
    train_clusters = {
        r["cluster_id_left"] for r in suite["train"].collect()
    } | {r["cluster_id_right"] for r in suite["train"].collect()}
    om_clusters = {
        r["cluster_id_left"] for r in suite["test_om"].collect()
    } | {r["cluster_id_right"] for r in suite["test_om"].collect()}
    assert train_clusters and om_clusters
    assert train_clusters.isdisjoint(om_clusters)
    # train/val/test pairwise disjoint and together = the core dataset
    keys = {
        k: {(r["url_left"], r["url_right"]) for r in suite[k].collect()}
        for k in ["train", "val", "test"]
    }
    assert keys["train"].isdisjoint(keys["val"])
    assert keys["train"].isdisjoint(keys["test"])
    assert keys["val"].isdisjoint(keys["test"])
    # RL: left side records never appear as a right side (disjoint
    # record split inside each cluster)
    rl = suite["test_rl"].collect()
    lefts = {r["url_left"] for r in rl}
    rights = {r["url_right"] for r in rl}
    assert lefts.isdisjoint(rights)


def test_suite_label_semantics_and_ratios(suite):
    """Every dataset: label == same-cluster; imbalanced sets hit their
    exact totals (supply permitting) with pos << neg."""
    for name, df in suite.items():
        for r in df.select(
            "cluster_id_left", "cluster_id_right", "label"
        ).collect():
            same = r["cluster_id_left"] == r["cluster_id_right"]
            assert r["label"] == (1 if same else 0), name
    pos_i = suite["test_i"].filter("label = 1").count()
    neg_i = suite["test_i"].filter("label = 0").count()
    assert pos_i == 10
    # negatives are capped by per-cluster candidate supply after the
    # train/val exclusion; the global take enforces AT MOST the total
    assert 100 <= neg_i <= 190, neg_i


def test_suite_imbalanced_excludes_train(suite):
    """test_i must not reuse any train/val pair (ref excluded_pairs,
    build_ali_dataset.py:311-315)."""
    tv = {
        (r["url_left"], r["url_right"])
        for k in ["train", "val"]
        for r in suite[k].collect()
    }
    ti = {(r["url_left"], r["url_right"]) for r in suite["test_i"].collect()}
    assert ti.isdisjoint(tv)


def test_suite_grid_evaluation(spark, records, suite):
    """The reference's test grid (test_ali.py): fit on the suite's
    train split, evaluate EVERY split with the frozen matcher — one
    metrics row per scenario, like the reference's results table."""
    from ember_spark.evaluate import evaluate_splits
    from ember_spark.plans.pipeline import ERPipeline

    pipe = ERPipeline(spark)
    matcher = pipe.fit_matcher(suite["train"])
    metrics = evaluate_splits(matcher, suite)
    assert set(metrics) == set(suite)
    for name, m in metrics.items():
        assert set(m) >= {"precision", "recall", "f1"}, name
    # in-distribution and unseen-record scenarios must both be strong
    assert metrics["test"]["f1"] >= 0.95, metrics["test"]
    assert metrics["test_rl"]["f1"] >= 0.9, metrics["test_rl"]
    assert metrics["test_om"]["f1"] >= 0.9, metrics["test_om"]


def test_suite_deterministic(spark, records):
    """Same seed -> byte-identical val split (windows over seeded md5
    keys everywhere; no rand())."""
    from ember_spark.operators.benchmark import build_benchmark_suite

    kw = dict(
        n_main_clusters=6, n_extra_clusters=2, min_cluster_size=4,
        num_pairs=4, rl_num_pairs=4, om_num_pairs=4,
        imbalance_pos=4, imbalance_neg=16, top_similar=2, seed=7,
    )
    a = sorted(map(tuple, build_benchmark_suite(records, **kw)["val"].collect()))
    b = sorted(map(tuple, build_benchmark_suite(records, **kw)["val"].collect()))
    assert a == b and len(a) > 0


def test_similar_clusters_topn(spark, records):
    """Sibling entities (same token family, FAMILY_SIZE=8) must dominate
    each cluster's most-similar list."""
    from ember_spark.functions.tokenize import tokenize_auto

    base = records.select(
        F.col("cluster_id").alias("cluster"),
        tokenize_auto(F.col("text"), F.col("lang")).alias("tokens"),
    )
    profiles = cluster_profiles(base, "cluster", "tokens")
    sims = similar_clusters(profiles, top_n=5)
    hit = sims.filter(
        (F.col("sim_rank") <= 2)
        & (F.floor(F.col("cluster_id") / 8) == F.floor(F.col("sim_cluster") / 8))
    ).count()
    total = sims.filter(F.col("sim_rank") <= 2).count()
    assert hit / total >= 0.5, f"only {hit}/{total} top-2 similars are family siblings"
