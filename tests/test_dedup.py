import pandas as pd
import pytest
from pyspark.sql import functions as F

from ember_spark.operators.ann import brute_force_topk, lsh_topk
from ember_spark.operators.dedup import (
    distinct_by_content,
    embedding_neardup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat near the river bank today"),  # near dup of 1
        (4, "completely different text about spark dataframes and shuffle partitions"),
        (5, "totally unrelated words regarding quantum computing and qubits research"),
        (6, "the quick brown fox leaps over the lazy dog near the river bank"),        # near dup of 1
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    df.cache().count()
    return df


def test_exact_dedup(spark, docs):
    groups = exact_dedup(docs).collect()
    assert len(groups) == 1
    assert groups[0]["canonical_id"] == 1 and groups[0]["dup_count"] == 2
    kept = distinct_by_content(docs)
    assert kept.count() == 5
    assert kept.filter("doc_id = 2").count() == 0


def test_minhash_lsh_dedup(spark, docs):
    pairs = {(r["id_l"], r["id_r"]) for r in minhash_lsh_dedup(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs  # exact dup: jaccard 1.0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert (1, 6) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r["id_l"], r["id_r"]) for r in ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_simhash_dedup(spark, docs):
    pairs = {(r["id_l"], r["id_r"]) for r in simhash_dedup(docs, max_hamming=12).collect()}
    assert (1, 2) in pairs  # identical text -> hamming 0
    assert (1, 3) in pairs  # one word changed -> small hamming
    assert (4, 5) not in pairs


@pytest.fixture(scope="module")
def embs(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    base = rng.normal(size=(5, 16))
    rows = []
    for i, v in enumerate(base):
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        # near-dup: tiny perturbation, cos > 0.99
        w = v + rng.normal(scale=0.02, size=16)
        w = w / np.linalg.norm(w)
        rows.append((i + 100, [float(x) for x in w]))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]),
                               "vec_id long, embedding array<float>")
    df.cache().count()
    return df


def test_embedding_neardup_brute_vs_lsh(spark, embs):
    brute = {(r["id_l"], r["id_r"]) for r in embedding_neardup(embs, threshold=0.95, brute_force=True).collect()}
    assert brute == {(i, i + 100) for i in range(5)}
    lsh = {(r["id_l"], r["id_r"]) for r in embedding_neardup(embs, threshold=0.95, planes=8).collect()}
    # LSH is approximate-recall, exact-precision: subset of brute, mostly found
    assert lsh <= brute
    assert len(lsh) >= 3


def test_brute_force_topk(spark, embs):
    res = brute_force_topk(embs, embs.filter("vec_id < 5"), k=1)
    got = {r["query_id"]: r["neighbor_id"] for r in res.collect()}
    assert got == {i: i + 100 for i in range(5)}  # nearest is the planted near-dup


def test_lsh_topk_mostly_agrees(spark, embs):
    res = lsh_topk(embs, embs.filter("vec_id < 5"), k=1, planes=8)
    got = {r["query_id"]: r["neighbor_id"] for r in res.collect()}
    hits = sum(1 for q, n in got.items() if n == q + 100)
    assert hits >= 3
