import pandas as pd
from pyspark.sql import functions as F

from ember_spark.operators.blocking import (
    block_census,
    candidate_pairs,
    cap_hot_blocks,
    exact_key_pairs,
    lsh_candidate_pairs,
    salted_repartition,
)


def _docs(spark):
    rows = [
        (1, ["red", "shoe", "nike", "size", "ten"], "a.com"),
        (2, ["red", "shoe", "nike", "size", "nine"], "a.com"),   # near-dup of 1
        (3, ["blue", "phone", "case", "apple", "mini"], "b.com"),
        (4, ["blue", "phone", "case", "apple", "max"], "c.com"),  # near-dup of 3
        (5, ["zeta", "gamma", "qqq", "www", "eee"], "a.com"),     # unrelated, shares domain
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "tokens", "domain"]),
        "id long, tokens array<string>, domain string",
    )


def test_exact_key_pairs(spark):
    df = _docs(spark)
    pairs = {(r["id_l"], r["id_r"]) for r in exact_key_pairs(df, "id", F.col("domain")).collect()}
    assert pairs == {(1, 2), (1, 5), (2, 5)}


def test_lsh_finds_near_dups_not_far(spark):
    df = _docs(spark)
    pairs = {
        (r["id_l"], r["id_r"])
        for r in lsh_candidate_pairs(df, "id", "tokens", num_hashes=32, bands=16, rows=2).collect()
    }
    # jaccard(1,2)=4/6≈0.67, jaccard(3,4)=4/6 -> P(候選)≈1-(1-0.44)^16≈0.9999
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    # doc 5 shares nothing; a collision would need a band-hash collision
    assert not any(5 in p for p in pairs)


def test_candidate_pairs_union_dedup(spark):
    df = _docs(spark)
    pairs = candidate_pairs(df, "id", "tokens", exact_key_exprs=[F.col("domain")])
    rows = pairs.collect()
    keys = [(r["id_l"], r["id_r"]) for r in rows]
    assert len(keys) == len(set(keys))  # deduped across key types
    assert {(1, 2), (3, 4), (1, 5), (2, 5)} <= set(keys)
    # canonical order
    assert all(l < r for l, r in keys)


def test_salted_repartition_spreads_hot_key(spark):
    """Opt-in skew salting (PipelineConfig.salt>0): one hot key's rows
    must land on multiple partitions, not pin a single task."""
    rows = [("hot", i) for i in range(2000)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "row_id"]), "key string, row_id long"
    )
    out = salted_repartition(df, "key", "row_id", partitions=8, salt=8)
    sizes = [
        r["n"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    # the hot key must not pin one task: spread over >1 partition and no
    # partition holds everything
    assert len(sizes) >= 2
    assert max(sizes) < 2000
    assert sum(sizes) == 2000


def test_cap_hot_blocks(spark):
    rows = [(i, "hot") for i in range(50)] + [(100, "cold"), (101, "cold"), (200, "solo")]
    keys = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "block_key"]), "id long, block_key string"
    )
    kept = cap_hot_blocks(keys, cap=10)
    got = {r["block_key"] for r in kept.select("block_key").distinct().collect()}
    assert got == {"cold"}  # hot capped out, solo has no pair potential
    census = {r["block_key"]: r["block_size"] for r in block_census(keys).collect()}
    assert census == {"hot": 50, "cold": 2, "solo": 1}
