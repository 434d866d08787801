"""End-to-end pipeline tests: planted-cluster recovery (pairwise F1 ≥
0.99, the BASELINE.json judge metric) and matcher F1 on the
ember-shaped labeled pair benchmark, train + held-out seed (the
reference evaluates at seeds 142/123, `run_ali.py:37`)."""

import pytest
from pyspark.sql import functions as F

from ember_spark.evaluate import cluster_pairwise_prf, featurize_pairs, pairwise_prf
from ember_spark.fixtures import generate_labeled_pairs, generate_pages, split_labels
from ember_spark.plans.pipeline import ERPipeline

#: the library featurizer (ember_spark.evaluate) is the single source;
#: other test modules import this alias
_featurize = featurize_pairs


@pytest.fixture(scope="module")
def corpus(spark):
    pw = generate_pages(spark, 300, seed=142).cache()
    pw.count()
    return pw


def test_pipeline_recovers_planted_clusters(spark, corpus):
    pages, labels = split_labels(corpus)
    pipe = ERPipeline(spark)
    out = pipe.run(pages.drop("text"))  # exercise the html-extraction path
    ents = out["entities"]
    truth_pos = (
        labels.alias("a")
        .join(labels.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("id_l"),
            F.col("b.url").alias("id_r"),
            F.lit(1).alias("label"),
        )
    )
    # cross-cluster NEGATIVES (label=0) so false merges are penalized —
    # a degenerate one-entity clustering must fail this gate. Sibling
    # clusters (+1, same token family) are the hard negatives; +37 the
    # random ones.
    truth_neg = (
        labels.alias("a")
        .join(
            labels.alias("b"),
            (F.col("b.cluster_id") == F.col("a.cluster_id") + 1)
            | (F.col("b.cluster_id") == F.col("a.cluster_id") + 37),
        )
        .select(
            F.least(F.col("a.url"), F.col("b.url")).alias("id_l"),
            F.greatest(F.col("a.url"), F.col("b.url")).alias("id_r"),
            F.lit(0).alias("label"),
        )
        .dropDuplicates(["id_l", "id_r"])
    )
    truth = truth_pos.unionByName(truth_neg)
    assert truth_neg.count() > 1000  # the gate is actually two-sided
    m = cluster_pairwise_prf(
        ents.withColumnRenamed("url", "id").withColumnRenamed("entity_id", "component"),
        truth,
        left_col="id_l",
        right_col="id_r",
    )
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m
    assert m["f1"] >= 0.99, m


def test_matcher_f1_on_labeled_pairs(spark):
    pipe = ERPipeline(spark)
    train = generate_labeled_pairs(spark, 300, seed=142).cache()
    matcher = pipe.fit_matcher(train)
    m_train = pairwise_prf(matcher.predict(_featurize(train)))
    assert m_train["f1"] >= 0.99, m_train
    held_out = generate_labeled_pairs(spark, 200, seed=123)
    m_test = pairwise_prf(matcher.predict(_featurize(held_out)))
    assert m_test["f1"] >= 0.99, m_test


def test_arrow_features_match_jvm_features(spark, corpus):
    """The arrow scoring path (hashed-token intersect in python +
    codegen cosine/len-ratio) must produce the same feature values as
    the JVM `pair_features` path on the same pairs — train (JVM
    featurizer) and serve (arrow) see one feature distribution.
    f_jaccard/f_containment may differ only on 32-bit hash collisions
    (none at this scale); f_cos/f_len_ratio/f_jw are same-source."""
    from ember_spark.plans.pipeline import PipelineConfig

    pages, _ = split_labels(corpus)
    pipe_a = ERPipeline(spark, PipelineConfig(feature_mode="arrow"))
    pipe_n = ERPipeline(spark, PipelineConfig(feature_mode="native", use_cascade=False))
    # slim=False: this ONE prepared table feeds both the arrow scorer
    # (th) and the JVM scorer (tokens + emb)
    prepared = pipe_a.prepare(pipe_a.extract(pages), slim=False).cache()
    pairs = pipe_a.block(prepared).cache()
    fa = {
        (r["id_l"], r["id_r"]): r
        for r in pipe_a.score(pairs, prepared).collect()
    }
    fn = {
        (r["id_l"], r["id_r"]): r
        for r in pipe_n.score(pairs, prepared).collect()
    }
    assert set(fa) == set(fn) and fa
    for k, ra in fa.items():
        rn = fn[k]
        for f in ["f_jaccard", "f_containment", "f_jw", "f_cos", "f_len_ratio"]:
            assert abs(ra[f] - rn[f]) < 1e-9, (k, f, ra[f], rn[f])


def test_pipeline_cascade_mode_recovers_clusters(spark, corpus):
    """feature_mode='cascade' (JVM features + cheap-model gate in front
    of Python JW) must hit the same F1 gate as the default arrow mode."""
    from ember_spark.plans.pipeline import PipelineConfig

    pages, labels = split_labels(corpus)
    pipe = ERPipeline(spark, PipelineConfig(feature_mode="cascade"))
    ents = pipe.run(pages)["entities"]
    truth = (
        labels.alias("a")
        .join(labels.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("id_l"),
            F.col("b.url").alias("id_r"),
            F.lit(1).alias("label"),
        )
    )
    m = cluster_pairwise_prf(
        ents.withColumnRenamed("url", "id").withColumnRenamed("entity_id", "component"),
        truth,
        left_col="id_l",
        right_col="id_r",
    )
    assert m["f1"] >= 0.99, m


def test_pipeline_no_rowwise_python_udf(spark, corpus):
    """Audit (SURVEY.md §7.3): the physical plan must contain no
    row-at-a-time Python (BatchEvalPython); ArrowEvalPython is the
    sanctioned vectorized path."""
    pages, _ = split_labels(corpus)
    pipe = ERPipeline(spark)
    prepared = pipe.prepare(pipe.extract(pages))
    pairs = pipe.block(prepared)
    scored = pipe.score(pairs, prepared)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_block_without_sig_applies_hot_filter(spark):
    """block() on a prepared input WITHOUT a sig column (the skip-
    prepare fallback) must apply the same corpus-hot-token exclusion
    prepare() bakes into signatures — a universal token would otherwise
    put every doc in one giant MinHash block (review finding r4)."""
    from ember_spark.plans.pipeline import PipelineConfig

    n = 60
    rows = [(f"u{i:03d}", ["corp"] + [f"t{i}a", f"t{i}b", f"t{i}c"]) for i in range(n)]
    base = spark.createDataFrame(rows, "url string, tokens array<string>")
    cfg = PipelineConfig(use_url_key=False, hot_token_df_frac=0.5)
    pipe = ERPipeline(spark, cfg)
    n_pairs = pipe.block(base).count()
    # docs share ONLY the universal token "corp": with it excluded the
    # MinHash bands see disjoint token sets, so (almost) nothing pairs;
    # unfiltered, every band key collides and the count explodes toward
    # n*(n-1)/2 = 1770 (or trips the hot-block cap)
    assert n_pairs < n


def test_hot_token_census_sampling_is_deterministic_and_consistent(spark):
    """Round-5 scale fix: corpora above `hot_token_census_docs` census a
    deterministic hash-SAMPLE (at 10^12 docs an exact stopword census is
    a full extra tokenize pass — profiled at ~50% of the whole prepare
    stage). Checks: (a) the sample census is run-to-run deterministic,
    (b) it still finds the planted corpus-hot token, (c) batch prepare
    and the public hot_token_list agree (the batch/streaming blocking-
    compatibility contract), (d) corpora at or below the target keep
    the EXACT census."""
    from ember_spark.plans.pipeline import PipelineConfig

    rows = [
        (f"http://h/{i}", f"boiler w{i}a w{i}b w{i}c", "en") for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "url string, text string, lang string")

    sampled_cfg = PipelineConfig(hot_token_census_docs=50)
    p1 = ERPipeline(spark, sampled_cfg)
    hot_a = p1.hot_token_list(docs)
    hot_b = ERPipeline(spark, sampled_cfg).hot_token_list(docs)
    assert hot_a == hot_b  # deterministic (hash sample, not rand())
    assert "boiler" in hot_a  # df=100% token survives any sample
    exact = ERPipeline(spark, PipelineConfig(hot_token_census_docs=0))
    assert "boiler" in exact.hot_token_list(docs)
    # at-or-below-target corpora take the exact path: identical output
    big_target = ERPipeline(spark, PipelineConfig(hot_token_census_docs=100_000))
    assert big_target.hot_token_list(docs) == exact.hot_token_list(docs)
    # prepare()'s internal census (baked into the sig) matches the
    # public list: an exact duplicate pair still shares all band keys
    prep = p1.prepare(docs.limit(20))
    assert prep.select("sig").first()["sig"] is not None
