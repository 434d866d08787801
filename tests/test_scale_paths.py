"""Scale-path variants: bucketed payload attach (exchange-free joins),
reliable-storage CC checkpoints, optional jieba parity."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ember_spark.operators.blocking import (
    attach_pair_payload,
    attach_pair_payload_bucketed,
)
from ember_spark.operators.clustering import connected_components


@pytest.fixture()
def corpus_pairs(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"u{i}" for i in range(100)],
                "text": [f"text number {i}" for i in range(100)],
                "n": list(range(100)),
            }
        )
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_l": [f"u{i}" for i in range(0, 90)],
                "id_r": [f"u{i+5}" for i in range(0, 90)],
            }
        )
    )
    return docs, pairs


def test_bucketed_attach_matches_shuffle_attach(spark, corpus_pairs, tmp_path):
    docs, pairs = corpus_pairs
    shuffled = attach_pair_payload(
        pairs, docs, "url", ["text", "n"], broadcast_payload=False
    )
    bucketed = attach_pair_payload_bucketed(
        pairs, docs, "url", ["text", "n"], buckets=4,
        table_prefix="t_bkt", location=str(tmp_path),
    )
    a = sorted(map(tuple, shuffled.select(sorted(shuffled.columns)).collect()))
    b = sorted(map(tuple, bucketed.select(sorted(bucketed.columns)).collect()))
    assert a == b


def test_bucketed_attach_first_join_has_no_exchange(spark, corpus_pairs, tmp_path):
    """The whole point: bucket-to-bucket join without shuffling either
    side. The only Exchange allowed in the plan is the id_r re-shuffle
    of the intermediate (one, not three). Broadcast is disabled so the
    plan actually exercises the bucketed sort-merge path (tiny fixtures
    would otherwise broadcast and prove nothing)."""
    docs, pairs = corpus_pairs
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = attach_pair_payload_bucketed(
            pairs, docs, "url", ["text", "n"], buckets=4,
            table_prefix="t_bkt2", location=str(tmp_path),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert "SortMergeJoin" in plan, plan
        assert n_exchanges <= 1, f"expected <=1 exchange, plan:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cc_reliable_checkpoint_matches_local(spark, tmp_path):
    edges = spark.createDataFrame(
        pd.DataFrame({"id_l": [1, 2, 5, 7, 8], "id_r": [2, 3, 6, 8, 9]}),
        "id_l long, id_r long",
    )
    local = sorted(map(tuple, connected_components(edges).collect()))
    durable = sorted(
        map(
            tuple,
            connected_components(
                edges, checkpoint_dir=str(tmp_path / "cc")
            ).collect(),
        )
    )
    assert local == durable
    # iteration outputs actually landed on reliable storage, under an
    # input-fingerprint subdir so a different graph at the same root
    # can never be served another graph's iterations
    import os

    fps = os.listdir(tmp_path / "cc")
    assert len(fps) == 1
    iters = [
        d for d in os.listdir(tmp_path / "cc" / fps[0]) if d.startswith("cc_iter_")
    ]
    assert len(iters) >= 1

    other = spark.createDataFrame(
        pd.DataFrame({"id_l": [10, 11], "id_r": [11, 12]}), "id_l long, id_r long"
    )
    connected_components(other, checkpoint_dir=str(tmp_path / "cc")).collect()
    assert len(os.listdir(tmp_path / "cc")) == 2


@pytest.mark.skipif(
    not __import__("ember_spark.functions.tokenize", fromlist=["have_jieba"]).have_jieba(),
    reason="jieba not installed in this sandbox (char-bigram fallback is the default)",
)
def test_jieba_parity(spark):
    """When jieba IS available the zh path must match jieba.lcut with
    whitespace tokens dropped, deterministically."""
    import jieba

    from ember_spark.functions.tokenize import tokenize_auto

    texts = ["今天天气真好", "我爱自然语言处理"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts, "lang": ["zh", "zh"]}))
    got = [
        r["toks"]
        for r in df.select(
            tokenize_auto(F.col("text"), F.col("lang"), zh_tokenizer="jieba").alias("toks")
        ).collect()
    ]
    want = [[t for t in jieba.lcut(x) if t.strip() != ""] for x in texts]
    assert got == want
