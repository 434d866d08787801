"""Round-4 additions: full oracle coverage guard, the ann_lsh_topk
value oracle's engine-independence precondition, and the
ensure_parallelism narrow-scan fix."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from ember_spark.operators.blocking import ensure_parallelism


def test_every_query_has_a_value_oracle():
    """Driver-contract guard: every queries() entry must carry an
    oracle_sql() entry, so a future rows-only regression is caught in
    pytest rather than by the grading driver (VERDICT r3 polish item)."""
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    missing = sorted(qs - oracles)
    assert not missing, f"queries without a value oracle: {missing}"
    stale = sorted(oracles - qs)
    assert not stale, f"oracle_sql entries without a query: {stale}"


def test_lsh_oracle_planes_match_spark_side():
    """The ann_lsh_topk oracle embeds hyperplane coefficients as SQL
    literals; they must be the SAME deterministic blake2b planes the
    Spark UDF uses, and every literal must round-trip exactly."""
    from ember_spark.functions.hashing import plane_matrix

    sql = entry_mod._ann_lsh_oracle_sql(bands=8, rows=3, probe_bits=1, k=3)
    m = plane_matrix(24, 64)
    # spot-check plane 0 and plane 23 appear verbatim (float round-trip
    # — repr(float(v)), matching the oracle builder: repr(np.float64)
    # under numpy >= 2.0 is 'np.float64(...)', not SQL)
    for p in (0, 23):
        frag = ",".join(repr(float(v)) for v in m[:, p])
        assert frag in sql
    # the probe ball for rows=3, probe_bits=1 is XOR masks {0,1,2,4}
    assert "(0),(1),(2),(4)" in sql


def test_lsh_oracle_sign_margin_on_testdata():
    """Engine-independence precondition of the ann_lsh_topk value
    oracle: the minimum |projection| over the sf0.001 corpus must dwarf
    the cross-engine summation-order error (~1e-15), so every sign bit
    — hence every band key and candidate — is identical in Spark
    (numpy matmul) and DuckDB (list_dot_product)."""
    duckdb = pytest.importorskip("duckdb")
    from ember_spark.functions.hashing import plane_matrix

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    rows = duckdb.connect().execute(
        f"SELECT embedding FROM '{path}'"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    proj = X @ plane_matrix(24, 64)
    assert np.abs(proj).min() > 1e-7


def test_ensure_parallelism_spreads_narrow_input(spark):
    df = spark.range(100).coalesce(1)
    out = ensure_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100
    # already-wide inputs pass through without an extra shuffle
    wide = spark.range(100).repartition(spark.sparkContext.defaultParallelism + 4)
    assert ensure_parallelism(wide) is wide


def test_arrow_mode_never_ships_embedding(spark):
    """ADVICE r3: in arrow feature mode the pair payload must not carry
    emb even when the prepared frame lacks th — the scorer recomputes
    f_cos inside the UDF, so shipped embeddings are dead shuffle bytes."""
    from ember_spark.plans.pipeline import ERPipeline, PipelineConfig

    # hot_token_df_frac=0: at 30 docs the default 0.05 would mark every
    # df>=2 token corpus-hot and empty the blocking token sets
    pipe = ERPipeline(
        spark, PipelineConfig(feature_mode="arrow", hot_token_df_frac=0.0)
    )
    docs = spark.createDataFrame(
        [
            (f"u{i}{s}", f"item{i} widget{i} gadget{i} model{i} rev {s}", "en")
            for i in range(15)
            for s in ("a", "b")
        ],
        "url string, text string, lang string",
    )
    # slim=False: the arrow-without-th corner needs the tokens column
    # (a slim table carries neither tokens nor emb by design)
    prepared = pipe.prepare(docs, slim=False)
    pairs = pipe.block(prepared)
    # drop th AND emb: the arrow-without-th corner must not reference
    # emb at all (pre-fix code appended it to the pair payload and this
    # would fail with an unresolved column)
    scored = pipe.score(pairs, prepared.drop("th", "emb"))
    assert {"f_jaccard", "f_cos", "score", "prediction"} <= set(scored.columns)
    assert scored.count() > 0
