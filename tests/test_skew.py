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
