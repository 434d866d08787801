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
    pairs = {
        (r["id_l"], r["id_r"])
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.5, allow_unblocked=True).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_ngram_jaccard_pairs_requires_block(spark, docs):
    """The unblocked path is a hidden cartesian — it must not be the
    default (VERDICT r1 item 6)."""
    with pytest.raises(ValueError, match="cartesian"):
        ngram_jaccard_pairs(docs, n=2, threshold=0.5)


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
    lsh = {(r["id_l"], r["id_r"]) for r in embedding_neardup(embs, threshold=0.95).collect()}
    # banded LSH: exact precision AND near-1 recall (miss prob per pair
    # ~(1-p^rows)^bands ~ 1e-12 at cos 0.99 with bands=16, rows=3)
    assert lsh == brute


@pytest.fixture(scope="module")
def embs_moderate(spark):
    """Pairs planted at MODERATE cosine (~0.5-0.75) — the regime where
    the round-1 single-signature LSH had ~4% recall."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        v = rng.normal(size=32)
        v /= np.linalg.norm(v)
        # target cosine in [0.55, 0.75]: w = c*v + sqrt(1-c^2)*orthogonal
        c = 0.55 + 0.2 * rng.random()
        u = rng.normal(size=32)
        u -= (u @ v) * v
        u /= np.linalg.norm(u)
        w = c * v + np.sqrt(1 - c * c) * u
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in w]))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]),
                               "vec_id long, embedding array<float>")
    df.cache().count()
    return df


def test_embedding_neardup_recall_at_moderate_threshold(spark, embs_moderate):
    """Brute-vs-LSH parity at threshold 0.5 (VERDICT r1 item 3): banded
    hyperplane LSH must keep near-1 recall where AND-of-all-planes
    collapsed to ~4%."""
    brute = {(r["id_l"], r["id_r"])
             for r in embedding_neardup(embs_moderate, threshold=0.5, brute_force=True).collect()}
    planted = {(i, i + 1000) for i in range(60)}
    assert planted <= brute
    lsh = {(r["id_l"], r["id_r"])
           for r in embedding_neardup(embs_moderate, threshold=0.5, bands=16, rows=3).collect()}
    assert lsh <= brute  # verify step keeps precision exact
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.95, f"recall {recall} over {len(brute)} true pairs"


def test_brute_force_topk(spark, embs):
    res = brute_force_topk(embs, embs.filter("vec_id < 5"), k=1)
    got = {r["query_id"]: r["neighbor_id"] for r in res.collect()}
    assert got == {i: i + 100 for i in range(5)}  # nearest is the planted near-dup


def test_lsh_topk_mostly_agrees(spark, embs):
    res = lsh_topk(embs, embs.filter("vec_id < 5"), k=1, bands=8, rows=3, probe_bits=1)
    got = {r["query_id"]: r["neighbor_id"] for r in res.collect()}
    hits = sum(1 for q, n in got.items() if n == q + 100)
    assert hits >= 4


def test_probe_masks_full_hamming_ball(spark):
    """probe_bits=2 must generate all <=2-bit flips (ADVICE r1), not
    just single-bit ones."""
    from ember_spark.functions.hashing import _probe_masks

    masks = _probe_masks(rows=4, probe_bits=2)
    assert sorted(masks) == sorted(
        [0, 1, 2, 4, 8, 3, 5, 9, 6, 10, 12]
    )  # C(4,0)+C(4,1)+C(4,2) = 11 masks


def test_ivf_topk_exact_when_all_lists_probed(spark, embs_moderate):
    """IVF with n_probe == n_centroids probes every inverted list, so
    its candidate set is the whole corpus: result must EQUAL brute
    force row-for-row (same ordering, same tie-breaks)."""
    from ember_spark.operators.ann import ivf_topk

    q = embs_moderate.filter("vec_id < 10")
    brute = brute_force_topk(embs_moderate, q, k=3).collect()
    ivf = ivf_topk(
        embs_moderate, q, k=3, n_centroids=8, n_probe=8, sample_size=1000
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(((r["query_id"], r["rank"], r["neighbor_id"]) for r in brute)) == \
           sorted(((r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf))


def test_ivf_topk_recall_with_partial_probe(spark, embs_moderate):
    """With a planted top-1 neighbor at cos 0.55-0.75 and n_probe=4 of
    8 lists, IVF must still find most planted neighbors (quantizer
    cells are wide at dim 32 / 8 centroids, so probe-4 covers the
    neighborhood)."""
    from ember_spark.operators.ann import ivf_topk, train_centroids

    C = train_centroids(embs_moderate, n_centroids=8, sample_size=1000)
    q = embs_moderate.filter("vec_id < 60")  # the 60 planted bases
    got = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_topk(
            embs_moderate, q, k=1, centroids=C, n_probe=4
        ).collect()
    }
    hits = sum(1 for i in range(60) if got.get(i) == i + 1000)
    assert hits >= 45, f"IVF probe-4 recall {hits}/60"


def test_ivf_centroids_deterministic(spark, embs_moderate):
    from ember_spark.operators.ann import train_centroids
    import numpy as np

    c1 = train_centroids(embs_moderate, n_centroids=8, sample_size=500)
    c2 = train_centroids(embs_moderate, n_centroids=8, sample_size=500)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 32)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


def test_ivf_centroids_empty_corpus_fails_cleanly(spark, embs_moderate):
    import pytest as _pytest

    from ember_spark.operators.ann import train_centroids

    empty = embs_moderate.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="empty"):
        train_centroids(empty, n_centroids=8)


def test_embedding_neardup_verify_stage_compiles(spark):
    """Regression: the pair-verify cosine used to unroll 3*dim
    element_at terms (dot + both norms) INTO the broadcast-join
    consume; at dim=64 (the driver embeddings table's width) that
    overflowed the JVM's 64KB generated-method limit — Spark logged
    "Code grows beyond 64 KB" and silently interpreted the whole
    verify stage. Norms are now hoisted per record, leaving one
    dim-term dot per pair. codegen.fallback=false turns any future
    overflow back into a hard error instead of a silent slow path."""
    import numpy as np

    from ember_spark.operators.dedup import embedding_neardup

    rng = np.random.default_rng(11)
    rows = []
    for i in range(48):
        v = rng.normal(size=64)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i % 3 == 0:  # plant a near-dup so the verify path has work
            w = v + 0.1 * rng.normal(size=64)
            w /= np.linalg.norm(w)
            rows.append((1000 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        out = embedding_neardup(df, threshold=0.5, bands=16, rows=3)
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
