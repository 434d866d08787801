import pandas as pd
from pyspark.sql import functions as F

from ember_spark.functions.hashing import (
    hash_embedding_py,
    lsh_band_keys,
    make_hash_embedding_udf,
    minhash_signature,
    simhash64_py,
    simhash64_udf,
)


def test_minhash_deterministic_and_set_semantics(spark):
    pdf = pd.DataFrame(
        {
            "t": [
                ["a", "b", "c"],
                ["c", "b", "a"],          # order-insensitive
                ["a", "a", "b", "c"],     # duplicate-insensitive
                ["x", "y"],
            ]
        }
    )
    df = spark.createDataFrame(pdf, "t array<string>")
    sigs = [r["s"] for r in df.select(minhash_signature(F.col("t"), 16).alias("s")).collect()]
    assert sigs[0] == sigs[1] == sigs[2]
    assert sigs[0] != sigs[3]
    assert len(sigs[0]) == 16
    # run twice -> identical (deterministic across jobs)
    sigs2 = [r["s"] for r in df.select(minhash_signature(F.col("t"), 16).alias("s")).collect()]
    assert sigs == sigs2


def test_minhash_similarity_monotonicity(spark):
    """More shared tokens -> more matching signature slots (statistically)."""
    a = [f"t{i}" for i in range(20)]
    near = a[:18] + ["x1", "x2"]
    far = [f"u{i}" for i in range(20)]
    pdf = pd.DataFrame({"t": [a, near, far]})
    df = spark.createDataFrame(pdf, "t array<string>")
    s = [r["s"] for r in df.select(minhash_signature(F.col("t"), 64).alias("s")).collect()]
    match_near = sum(x == y for x, y in zip(s[0], s[1]))
    match_far = sum(x == y for x, y in zip(s[0], s[2]))
    assert match_near > 40  # E ≈ 64 * 18/22 ≈ 52
    assert match_far < 10


def test_lsh_band_keys(spark):
    pdf = pd.DataFrame({"t": [["a", "b", "c", "d"], ["a", "b", "c", "d"], ["q", "r", "s"]]})
    df = spark.createDataFrame(pdf, "t array<string>")
    sig = minhash_signature(F.col("t"), 8)
    bands = [r["b"] for r in df.select(lsh_band_keys(sig, 4, 2).alias("b")).collect()]
    assert bands[0] == bands[1]
    assert len(bands[0]) == 4
    assert bands[0] != bands[2]


def test_simhash_udf_matches_python(spark):
    toks = [["a", "b", "c"], ["a", "b", "d"], [], None]
    pdf = pd.DataFrame({"t": toks})
    df = spark.createDataFrame(pdf, "t array<string>")
    got = [r["h"] for r in df.select(simhash64_udf(F.col("t")).alias("h")).collect()]
    exp = [simhash64_py(t) for t in toks]
    assert got == exp
    # near lists -> small hamming distance
    d_near = bin((got[0] ^ got[1]) & ((1 << 64) - 1)).count("1")
    assert d_near <= 24


def test_hash_embedding(spark):
    emb = make_hash_embedding_udf(32)
    pdf = pd.DataFrame({"t": [["a", "b"], ["a", "b"], ["z", "q", "w"]]})
    df = spark.createDataFrame(pdf, "t array<string>")
    got = [r["e"] for r in df.select(emb(F.col("t")).alias("e")).collect()]
    exp0 = hash_embedding_py(["a", "b"], 32)
    assert len(got[0]) == 32
    assert got[0] == got[1]
    for g, e in zip(got[0], exp0):
        assert abs(g - e) < 1e-6
    norm = sum(x * x for x in got[2])
    assert abs(norm - 1.0) < 1e-5


def test_prepare_batch_matches_per_doc_kernels():
    """prepare_batch (the batched Arrow kernel behind make_prepare_udf)
    must be VALUE-IDENTICAL to the per-doc reference kernels it
    replaced: th_from_tokens / emb_from_th / minhash_signature_py over
    array_except-filtered tokens. Covers None, empty, all-hot,
    duplicate and unicode docs plus a 400-doc random corpus."""
    import random

    import numpy as np

    from ember_spark.functions.hashing import (
        emb_from_th,
        hot_u64_array,
        minhash_signature_py,
        prepare_batch,
        th_from_tokens,
    )

    rng = random.Random(7)
    vocab = (
        [f"tok{i}" for i in range(300)]
        + [f"热{i}" for i in range(50)]
        + ["", "a", "éé"]
    )
    hot = ["tok1", "tok2", "热3", "nonexistent"]
    hot_set = set(hot)
    cases = [None, [], ["tok1", "tok2"], ["tok1", "tok1", "tok5", "tok5"]]
    for _ in range(400):
        cases.append([rng.choice(vocab) for _ in range(rng.randint(0, 120))])

    def ref(tl):
        th = th_from_tokens(list(tl) if tl is not None else None)
        emb = emb_from_th(th, 64)
        # array_except semantics: drop hot, dedup, first-occurrence order
        bt = None
        if tl is not None:
            seen: set = set()
            bt = [t for t in tl if t not in hot_set and not (t in seen or seen.add(t))]
        sig = np.array(minhash_signature_py(bt, 64), dtype=np.int64)
        return th, emb, sig

    for hot_list in (hot, []):
        hs = hot_u64_array(hot_list)
        embs, sigs, ths = prepare_batch(cases, hs, 64, 64)
        for i, tl in enumerate(cases):
            if hot_list:
                rth, remb, rsig = ref(tl)
            else:
                rth = th_from_tokens(list(tl) if tl is not None else None)
                remb = emb_from_th(rth, 64)
                rsig = np.array(
                    minhash_signature_py(list(tl) if tl is not None else None, 64),
                    dtype=np.int64,
                )
            assert ths[i].dtype == np.int32 and np.array_equal(ths[i], rth)
            assert embs[i].dtype == np.float32 and np.array_equal(embs[i], remb)
            assert np.array_equal(np.asarray(sigs[i]), rsig)


def test_prepare_batch_rejects_null_token_element():
    """pd.factorize codes a None element as -1; unguarded, uh[codes]
    would gather uh[-1] — the LAST unique token's hash — silently
    corrupting th/emb/sig. The kernel must fail loudly instead."""
    import numpy as np
    import pytest

    from ember_spark.functions.hashing import hot_u64_array, prepare_batch

    hs = hot_u64_array([])
    with pytest.raises(ValueError, match="null element"):
        prepare_batch([["tok1", None, "tok2"]], hs, 64, 64)
    # all-null batch: uniq is empty, uh[-1] would raise IndexError
    with pytest.raises(ValueError, match="null element"):
        prepare_batch([[None]], hs, 64, 64)
    # None/empty DOCS (not elements) stay legal
    embs, sigs, ths = prepare_batch([None, []], hs, 64, 64)
    assert len(ths) == 2 and ths[0].size == 0 and ths[1].size == 0
    assert np.asarray(sigs[0]).size == 64


def test_pair_cos_batch_matches_scalar_exactly():
    """pair_cos_from_th_batch (whole-batch bincount scatter) must be
    BIT-identical to the per-pair form the scoring UDF used before:
    float64 dot of emb_from_th(a) and emb_from_th(b). Covers empty and
    None sides, duplicate-slot accumulation, and a non-power-of-2 dim
    (which exercises the % path instead of the & mask)."""
    import numpy as np

    from ember_spark.functions.hashing import emb_from_th, pair_cos_from_th_batch

    rng = np.random.default_rng(142)
    cases = []
    for trial in range(200):
        la, lb = rng.integers(0, 180, 2)
        a = (
            np.unique(rng.integers(-(2**31), 2**31, la).astype(np.int32))
            if la
            else np.empty(0, np.int32)
        )
        b = (
            np.unique(rng.integers(-(2**31), 2**31, lb).astype(np.int32))
            if lb
            else np.empty(0, np.int32)
        )
        if trial % 17 == 0:
            a = None
        if trial % 23 == 0:
            b = None
        cases.append((a, b))
    tl = [c[0] for c in cases]
    tr = [c[1] for c in cases]
    for dim in (64, 48):
        batch = pair_cos_from_th_batch(tl, tr, dim)
        scalar = np.array(
            [
                float(
                    np.dot(
                        emb_from_th(a, dim).astype(np.float64),
                        emb_from_th(b, dim).astype(np.float64),
                    )
                )
                for a, b in cases
            ]
        )
        assert np.array_equal(batch, scalar), dim
