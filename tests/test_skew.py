"""salted_join: skew-spreading equi-join that keeps every row.

Semantics contract: for any input, salted_join(fat, compact, on=k) must
return EXACTLY the rows of fat.join(compact, k) (inner) or
fat.join(compact, k, "left") — salting is a physical rewrite only.
The skew property is that a hot key's rows land on `salt` distinct
(key, salt) reducer keys instead of one.
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from ember_spark.operators.skew import salted_join


def _counts(df, cols):
    return sorted(
        (tuple(r[c] for c in cols), r["n"])
        for r in df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).collect()
    )


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (80% of rows), a cold tail, and a key missing from compact
    fat = spark.createDataFrame(
        [Row(k=1 if i % 10 < 8 else (2 + i % 5), v=i) for i in range(1000)]
        + [Row(k=99, v=-1)]  # no match in compact
    )
    compact = spark.createDataFrame(
        [Row(k=k, name=f"dim{k}") for k in range(1, 7)]
    )
    return fat, compact


def test_inner_matches_plain_join(skewed):
    fat, compact = skewed
    got = salted_join(fat, compact, on="k", salt=8)
    want = fat.join(compact, "k")
    cols = ["k", "v", "name"]
    assert _counts(got, cols) == _counts(want, cols)
    assert got.count() == 1000  # hot+tail matched, k=99 dropped


def test_left_keeps_every_fat_row(skewed):
    fat, compact = skewed
    got = salted_join(fat, compact, on="k", salt=8, how="left")
    want = fat.join(compact, "k", "left")
    cols = ["k", "v", "name"]
    assert _counts(got, cols) == _counts(want, cols)
    assert got.count() == fat.count()  # k=99 survives null-extended


def test_hot_key_spreads_across_salts(skewed):
    fat, _ = skewed
    keys = [s for s in ("k",)]
    hash_cols = [c for c in fat.columns if c not in keys]
    spread = (
        fat.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert spread == 8  # 800 hot rows cover all 8 salt buckets


def test_deterministic(skewed):
    fat, compact = skewed
    a = _counts(salted_join(fat, compact, on="k", salt=4), ["k", "v"])
    b = _counts(salted_join(fat, compact, on="k", salt=4), ["k", "v"])
    assert a == b


def test_refuses_right_and_full(skewed):
    fat, compact = skewed
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(fat, compact, on="k", how=how)


def test_refuses_salt_column_collision(spark):
    fat = spark.createDataFrame([Row(k=1, _salt=9)])
    compact = spark.createDataFrame([Row(k=1, name="a")])
    with pytest.raises(ValueError, match="_salt"):
        salted_join(fat, compact, on="k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(compact, fat, on="k")


def test_key_only_fat_side(spark):
    fat = spark.createDataFrame([Row(k=1)] * 10 + [Row(k=2)] * 3)
    compact = spark.createDataFrame([Row(k=1, name="a"), Row(k=2, name="b")])
    got = salted_join(fat, compact, on="k", salt=4)
    assert got.count() == 13


@settings(max_examples=8, deadline=None)
@given(
    fat_rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=0, max_size=40
    ),
    dim_keys=st.sets(st.integers(0, 7), max_size=6),
    salt=st.integers(1, 5),
    how=st.sampled_from(["inner", "left"]),
)
def test_property_salting_is_a_physical_rewrite(spark, fat_rows, dim_keys, salt, how):
    """For arbitrary inputs (dup keys, unmatched keys on both sides,
    empty sides), salted_join == plain join as a multiset."""
    fat = spark.createDataFrame(fat_rows or [(99, 0)], "k int, v int")
    if not fat_rows:
        fat = fat.filter("k < 0")  # truly empty, schema kept
    compact = spark.createDataFrame(
        [(k, f"d{k}") for k in sorted(dim_keys)] or [(99, "d")], "k int, name string"
    )
    if not dim_keys:
        compact = compact.filter("k < 0")
    got = salted_join(fat, compact, on="k", salt=salt, how=how)
    want = fat.join(compact, "k", how)
    cols = ["k", "v", "name"]
    assert _counts(got, cols) == _counts(want, cols)


@settings(max_examples=8, deadline=None)
@given(
    fat_rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=0, max_size=40
    ),
    dim_keys=st.sets(st.integers(0, 7), max_size=6),
    hot_keys=st.sets(st.integers(0, 7), max_size=3),
    salt=st.integers(1, 5),
    how=st.sampled_from(["inner", "left"]),
)
def test_property_hot_split_is_a_physical_rewrite(
    spark, fat_rows, dim_keys, hot_keys, salt, how
):
    """salted_join_hot == plain join as a multiset for arbitrary inputs
    and ANY hot-key list — hot keys missing from fat, missing from
    compact, or covering everything; empty hot list degrades to the
    plain join."""
    from ember_spark.operators.skew import salted_join_hot

    fat = spark.createDataFrame(fat_rows or [(99, 0)], "k int, v int")
    if not fat_rows:
        fat = fat.filter("k < 0")
    compact = spark.createDataFrame(
        [(k, f"d{k}") for k in sorted(dim_keys)] or [(99, "d")], "k int, name string"
    )
    if not dim_keys:
        compact = compact.filter("k < 0")
    got = salted_join_hot(
        fat, compact, on="k", hot_keys=sorted(hot_keys), salt=salt, how=how
    )
    want = fat.join(compact, "k", how)
    cols = ["k", "v", "name"]
    assert _counts(got, cols) == _counts(want, cols)


def test_hot_split_replicates_only_hot_payload_rows(spark):
    """The replicated relation in the hot branch is |hot| x salt rows,
    not |compact| x salt — the whole point of the split."""
    from ember_spark.operators.skew import salted_join_hot

    fat = spark.createDataFrame(
        [(7, i) for i in range(100)] + [(i % 50 + 100, i) for i in range(100)],
        "k long, v long",
    )
    compact = spark.createDataFrame(
        [(k, f"d{k}") for k in list(range(100, 160)) + [7]], "k long, name string"
    )
    got = salted_join_hot(fat, compact, on="k", hot_keys=[7], salt=16)
    assert got.count() == 200
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    # the exploded side is filtered to the hot keys BEFORE replication
    assert "isin" in plan.lower() or "IN (7)" in plan or "= 7" in plan


# ------------------------------------------------ pipeline wiring (round 4)
def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_payload_attach_salts_only_the_hot_side(spark):
    """attach_pair_payload(salt, trigger): a pair table where one id_l
    is a 30%+ hub must salt the id_l join (the '_salt' key appears in
    the plan), a uniform side must keep the plain join, and the rows
    must equal the unsalted attach exactly."""
    from ember_spark.operators.blocking import attach_pair_payload, hot_pair_key_fracs

    # hub: id_l=0 in 300 of ~700 pairs (~43%); id_r spread uniformly
    rows = [(0, 1000 + i) for i in range(300)] + [
        (1 + (i % 40), 2000 + i) for i in range(400)
    ]
    pairs = spark.createDataFrame(rows, "id_l long, id_r long").persist()
    ids = sorted({r for pair in rows for r in pair})
    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in ids], "id long, text string"
    )
    fracs = hot_pair_key_fracs(pairs)
    assert fracs["id_l"] > 0.4 and fracs["id_r"] < 0.01

    got = attach_pair_payload(
        pairs, corpus, "id", ["text"],
        broadcast_payload=False, salt=8, salt_trigger_frac=0.25,
    )
    want = attach_pair_payload(pairs, corpus, "id", ["text"], broadcast_payload=False)
    cols = ["id_l", "id_r", "text_l", "text_r"]
    assert _counts(got, cols) == _counts(want, cols)
    plan = _plan(got)
    # the hot id_l join is salted — its salt derives from id_r — and
    # exactly one explode-replicated compact side exists: the uniform
    # id_r side kept the plain join
    assert "pmod(xxhash64(id_r" in plan
    assert "pmod(xxhash64(id_l" not in plan
    assert plan.count("Generate explode") == 1
    # a fully-uniform pair table must not salt at all
    uni = spark.createDataFrame(
        [(i % 40, 40 + i % 40 + (i % 7)) for i in range(400)], "id_l long, id_r long"
    ).persist()
    uni_corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "id long, text string"
    )
    got_uni = attach_pair_payload(
        uni, uni_corpus, "id", ["text"],
        broadcast_payload=False, salt=8, salt_trigger_frac=0.25,
    )
    assert "_salt" not in _plan(got_uni)
    pairs.unpersist(); uni.unpersist()


def test_pipeline_payload_salt_output_identical(spark):
    """ERPipeline with payload_salt armed produces byte-identical scored
    pairs to the default config — salting is a physical rewrite only."""
    from ember_spark.plans.pipeline import ERPipeline, PipelineConfig

    docs = spark.createDataFrame(
        [
            (f"u{i}{s}", f"item{i} widget{i} gadget{i} model{i} rev {s}", "en")
            for i in range(12)
            for s in ("a", "b")
        ],
        "url string, text string, lang string",
    )
    base = ERPipeline(spark, PipelineConfig(hot_token_df_frac=0.0))
    salted = ERPipeline(
        spark,
        PipelineConfig(hot_token_df_frac=0.0, payload_salt=4,
                       payload_salt_trigger_frac=0.0),
    )
    prep_b = base.prepare(docs).persist()
    pairs_b = base.block(prep_b).persist()
    s1 = base.score(pairs_b, prep_b)
    s2 = salted.score(pairs_b, prep_b)
    cols = ["id_l", "id_r", "score", "prediction"]
    assert _counts(s1, cols) == _counts(s2, cols)
    assert s1.count() > 0
    prep_b.unpersist(); pairs_b.unpersist()


def test_payload_attach_salt_census_on_empty_pairs(spark):
    """An EMPTY pair table with the census trigger armed must return an
    empty attach (plain joins), not KeyError on the missing census rows
    — an all-unique corpus yields zero candidate pairs and the score
    stage must survive it."""
    from ember_spark.operators.blocking import attach_pair_payload

    pairs = spark.createDataFrame([], "id_l long, id_r long")
    corpus = spark.createDataFrame([(1, "t")], "id long, text string")
    out = attach_pair_payload(
        pairs, corpus, "id", ["text"],
        broadcast_payload=False, salt=8, salt_trigger_frac=0.25,
    )
    assert out.count() == 0
    assert set(out.columns) == {"id_l", "id_r", "text_l", "text_r"}
