"""Round-5 regression tests.

pair_overlap_cols (JVM codegen jaccard/containment) must be
value-IDENTICAL to the Arrow kernel's per-pair `_tok_overlap` path it
replaced on the scoring hot path — including null sides, empty arrays,
0/0 conventions, and duplicate-bearing token-string arrays.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

from ember_spark.operators.scoring import (
    make_pair_text_features_udf,
    with_pair_overlap,
)


def _scalar_overlap(a, b):
    """The exact python semantics the Arrow kernel used."""
    if a is None or b is None:
        la = 0 if a is None else len(set(a))
        lb = 0 if b is None else len(set(b))
        inter = 0
    else:
        sa, sb = set(a), set(b)
        inter, la, lb = len(sa & sb), len(sa), len(sb)
    union = la + lb - inter
    jac = inter / union if union else 0.0
    mn = min(la, lb)
    cont = inter / mn if mn else 0.0
    return jac, cont


def _check(spark, rows, elem_type, distinct):
    schema = StructType([
        StructField("a", ArrayType(elem_type)),
        StructField("b", ArrayType(elem_type)),
    ])
    df = spark.createDataFrame(rows, schema)
    got = (
        with_pair_overlap(df, F.col("a"), F.col("b"), distinct=distinct,
                          jac_name="j", cont_name="c")
        .select("j", "c").collect()
    )
    for (a, b), r in zip(rows, got):
        ej, ec = _scalar_overlap(a, b)
        assert r["j"] == ej, (a, b, r["j"], ej)
        assert r["c"] == ec, (a, b, r["c"], ec)


def test_pair_overlap_int_arrays_match_scalar_kernel(spark):
    rng = random.Random(5)
    rows = [(None, [1, 2]), ([1, 2], None), (None, None), ([], []),
            ([], [3]), ([1, 2, 3], [1, 2, 3])]
    for _ in range(60):
        a = sorted(rng.sample(range(-(2**31), 2**31 - 1), rng.randint(0, 40)))
        b = sorted(rng.sample(range(-(2**31), 2**31 - 1), rng.randint(0, 40)))
        if rng.random() < 0.5 and a and b:
            b = sorted(set(b[: len(b) // 2] + a[: len(a) // 2]))
        rows.append((a, b))
    _check(spark, rows, IntegerType(), distinct=False)


def test_pair_overlap_string_arrays_with_duplicates(spark):
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(30)]
    rows = [(None, ["x"]), ([], ["x", "x"]), (["a", "a"], ["a"])]
    for _ in range(40):
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        rows.append((a, b))
    _check(spark, rows, StringType(), distinct=True)


def test_slim_udf_drops_overlap_fields(spark):
    """include_overlap=False keeps only the batched metrics (jw, cos)
    and they stay identical to the full kernel's."""
    schema = StructType([
        StructField("tl", StringType()), StructField("tr", StringType()),
        StructField("a", ArrayType(LongType())),
        StructField("b", ArrayType(LongType())),
    ])
    rows = [("alpha beta", "alpha bexa", [1, 2, 3], [2, 3, 4]),
            ("", "x", [], [1]), ("same", "same", [5], [5])]
    df = spark.createDataFrame(rows, schema)
    full = make_pair_text_features_udf(emb_dim=64)
    slim = make_pair_text_features_udf(emb_dim=64, include_overlap=False)
    got = df.select(
        full("tl", "tr", "a", "b").alias("f"),
        slim("tl", "tr", "a", "b").alias("s"),
    ).collect()
    for r in got:
        assert set(r["s"].asDict()) == {"f_jw", "f_cos"}
        assert r["s"]["f_jw"] == r["f"]["f_jw"]
        assert r["s"]["f_cos"] == r["f"]["f_cos"]


def test_pairs_from_keys_drops_null_keys(spark):
    """A NULL key never equi-joins, so the pre-rewrite self-join
    emitted no pairs for keyless records; the grouped-combinations
    rewrite must not weld them into one spurious block."""
    from ember_spark.operators.blocking import _pairs_from_keys

    rows = [(1, "a"), (2, "a"), (10, None), (11, None), (12, None)]
    keys = spark.createDataFrame(rows, ["id", "k"])
    got = {(r["id_l"], r["id_r"]) for r in _pairs_from_keys(keys, "id", "k").collect()}
    assert got == {(1, 2)}  # no pairs among the three null-key records


def test_hot_pair_keys_without_n_pairs_matches_supplied_total(spark):
    """With n_pairs omitted, the census derives the total from its own
    per-id counts (one pair-lineage scan) — same hot set either way."""
    from ember_spark.operators.blocking import hot_pair_keys

    rows = [(7, i % 50) for i in range(400)] + [(i % 90 + 100, 999) for i in range(600)]
    pairs = spark.createDataFrame(rows, ["id_l", "id_r"])
    a = hot_pair_keys(pairs, 0.25)
    b = hot_pair_keys(pairs, 0.25, n_pairs=1000)
    assert {k: sorted(v) for k, v in a.items()} == {k: sorted(v) for k, v in b.items()}
    assert a["id_l"] == [7] and a["id_r"] == [999]


def test_hot_token_census_samples_just_past_target(spark):
    """floor(n/target) gave k=1 — no sampling — for target < n <
    2*target; ceil must sample whenever n > target. Observable via the
    census running on the pmod-filtered subset: with a token that is
    hot only OUTSIDE the kept sample, the sampled census misses it."""
    from pyspark.sql import functions as F  # noqa: F811

    from ember_spark.plans.pipeline import ERPipeline, PipelineConfig

    n, target = 150, 100
    docs = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
    )
    k = -(-n // target)
    assert k == 2  # the regime floor() got wrong
    kept = docs.filter(F.pmod(F.xxhash64("url"), F.lit(k)) == 0).count()
    assert kept < n  # sampling actually engaged just past the target
    pipe = ERPipeline(
        spark,
        PipelineConfig(hot_token_df_frac=0.9, hot_token_census_docs=target),
    )
    # every doc is the single token "x": the exact census and the
    # sampled census agree on the hot set (df-fraction invariant under
    # uniform sampling) — the pipeline-level behavior the knob promises
    assert pipe.hot_token_list(docs) == ["x"]


def test_cc_members_only_identical_across_local_and_distributed(spark):
    """Roots are omitted on BOTH paths; the row set must not depend on
    which side of local_threshold the input lands."""
    from ember_spark.operators.clustering import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["a", "b"]
    )
    local = connected_components(edges, "a", "b", members_only=True)
    dist = connected_components(
        edges, "a", "b", members_only=True, local_threshold=0
    )
    rows_l = {(r["id"], r["component"]) for r in local.collect()}
    rows_d = {(r["id"], r["component"]) for r in dist.collect()}
    assert rows_l == rows_d == {(2, 1), (3, 1), (11, 10)}  # no (1,1)/(10,10)


def test_cc_checkpoint_fingerprint_sees_column_choice(spark, tmp_path):
    """Same DataFrame, different dst column: the second call must not
    resume the first graph's iterations."""
    from ember_spark.operators.clustering import connected_components

    df = spark.createDataFrame([(1, 2, 3), (4, 5, 6)], ["a", "b", "c"])
    r1 = connected_components(df, "a", "b", checkpoint_dir=str(tmp_path))
    got1 = {(r["id"], r["component"]) for r in r1.collect()}
    r2 = connected_components(df, "a", "c", checkpoint_dir=str(tmp_path))
    got2 = {(r["id"], r["component"]) for r in r2.collect()}
    assert got1 == {(1, 1), (2, 1), (4, 4), (5, 4)}
    assert got2 == {(1, 1), (3, 1), (4, 4), (6, 4)}


def test_benchmark_totals_mode_empty_corpus(spark):
    """totals mode on a clusterless corpus returns the empty pair
    table instead of ZeroDivisionError on the per-cluster quota."""
    from ember_spark.operators.benchmark import build_benchmark_pairs

    empty = spark.createDataFrame(
        [], "url string, text string, lang string, cluster_id long"
    )
    out = build_benchmark_pairs(empty, total_pos=500, total_neg=1500)
    assert out.count() == 0
    assert "label" in out.columns


def test_ann_null_and_empty_embedding_handling(spark):
    """LSH/IVF tolerate null-embedding rows (dropped, like the LSH
    banding UDF already did) and fail clearly on an empty corpus."""
    import pytest as _pytest

    from ember_spark.operators.ann import ivf_topk, lsh_topk

    rows = [(0, None)] + [
        (i, [float((i * 7 + j) % 5 - 2) for j in range(16)]) for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # dim inference skips the null first row (was: dim=-1, silent empty)
    out = lsh_topk(df, df.limit(5), k=3, bands=4, rows=2)
    assert out.count() > 0
    # IVF: null rows dropped before np.stack (was: opaque shape error)
    out2 = ivf_topk(df, df.limit(5), k=3, n_centroids=4, n_probe=4)
    assert out2.count() > 0
    empty = df.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="empty"):
        lsh_topk(empty, df.limit(1), k=1)


def test_manifest_is_done_only_matches_latest_fingerprint(spark, tmp_path):
    """The manifest is append-only but the data dir is overwritten in
    place: after an A->B flip, a rerun with A must NOT be served B's
    bytes just because A appears somewhere in the history."""
    from ember_spark.plans.manifest import StageManifest

    m = StageManifest(spark, str(tmp_path))
    m.run_stage("s1", "fpA", lambda: spark.range(3).toDF("x"))
    m.run_stage("s1", "fpB", lambda: spark.range(7).toDF("x"))
    assert m.is_done("s1", "fpB")
    assert not m.is_done("s1", "fpA")  # stale history row must not count
    # torn trailing line (kill mid-append) must not brick resume
    with open(tmp_path / "_manifest" / "manifest.jsonl", "a") as f:
        f.write('{"stage": "s1", "fingerpr')
    assert m.is_done("s1", "fpB")


def test_lang_id_empty_text_is_not_zh(spark):
    from ember_spark.operators.textstats import add_lang_id

    df = spark.createDataFrame(
        [("", ), ("天天向上学习", ), ("the cat and the hat", )], ["text"]
    )
    got = [r["lang_pred"] for r in add_lang_id(df).collect()]
    assert got == ["und", "zh", "en"]


def test_salted_join_rejects_zero_salt(spark):
    import pytest as _pytest

    from ember_spark.operators.skew import salted_join

    fat = spark.createDataFrame([(1, "a")], ["k", "v"])
    compact = spark.createDataFrame([(1, "p")], ["k", "w"])
    with _pytest.raises(ValueError, match="salt"):
        salted_join(fat, compact, "k", salt=0)


def test_image_pair_features_tolerate_null_vectors(spark):
    from ember_spark.operators.multimodal import image_pair_features

    rows = [
        (1, [1.0, 0.0], [1.0, 0.0]),
        (2, None, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "id long, img_features_l array<double>, img_features_r array<double>"
    )
    out = {r["id"]: r["img_cos"] for r in image_pair_features(df).collect()}
    assert out[1] == 1.0
    import math
    # null side -> cos 0.0 (NaN norm fails the denom>0 gate), not a crash
    assert out[2] == 0.0 or math.isnan(out[2])


def test_csv_multichar_delim_tolerates_short_rows(spark, tmp_path):
    """Spark 4's default ANSI mode made getItem abort the whole scan on
    one truncated line; F.get null-pads instead."""
    from ember_spark.sources.readers import read_csv_multichar_delim

    p = tmp_path / "rows.txt"
    p.write_text("a@;@b@;@c\nshort\n@;@only-second@;@\n")
    df = read_csv_multichar_delim(spark, str(p), "@;@", ["x", "y", "z"])
    rows = {tuple(r) for r in df.collect()}
    assert ("a", "b", "c") in rows
    assert ("short", None, None) in rows  # truncated line null-pads
    assert ("", "only-second", "") in rows


def test_x4_tokenize_stats_survives_empty_documents(spark, tmp_path):
    """A document tokenizing to zero tokens must yield NULL first/last
    token (the DuckDB oracle's [1]/[-1] semantics), not abort the scan
    — under Spark 4's default ANSI mode a plain element_at raises
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT for the empty array."""
    import __spark_entry__ as e

    p = str(tmp_path)
    spark.createDataFrame(
        [(1, "hello world", "en"), (2, "", "en"), (3, "   ", "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(f"{p}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in e.queries()["x4_tokenize_stats"](spark, p).collect()
    }
    assert rows[1]["first_token"] == "hello"
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["first_token"] is None and rows[2]["last_token"] is None
    assert rows[3]["first_token"] is None


def test_write_table_parquet_fallback_honors_all_modes(spark, tmp_path):
    """Without an Iceberg catalog, write_table falls back to parquet
    and must honor error/ignore semantics — mode='error' protects an
    existing table, mode='ignore' leaves it untouched."""
    import pytest

    from ember_spark.sources.writers import write_table

    p = str(tmp_path / "tbl")
    df1 = spark.range(3).toDF("id")
    df2 = spark.range(10, 14).toDF("id")
    write_table(df1, p, mode="error")
    assert spark.read.parquet(p).count() == 3
    with pytest.raises(Exception):
        write_table(df2, p, mode="error")
    write_table(df2, p, mode="ignore")
    assert spark.read.parquet(p).count() == 3  # untouched
    write_table(df2, p, mode="append")
    assert spark.read.parquet(p).count() == 7
    write_table(df2, p, mode="overwrite")
    assert spark.read.parquet(p).count() == 4
