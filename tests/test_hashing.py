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
