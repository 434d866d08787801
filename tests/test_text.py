"""Byte-identity invariant tests (SURVEY.md §7.3 hard part 1).

The Spark serialization must equal the pure-Python reference semantics
`" ".join(str(x or "") for x in attrs)` byte for byte, including the
doubled/trailing spaces `concat_ws` would eat.
"""

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ember_spark.fixtures import generate_attrs_raw
from ember_spark.functions.text import (
    extract_text_from_html,
    serialize_attrs,
    serialize_attrs_py,
    strip_separators,
    strip_separators_py,
)

attr_str = st.one_of(
    st.none(),
    st.text(alphabet="ab #:;0&<>'\"", max_size=12),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(attr_str, min_size=1, max_size=4))
def test_serialize_attrs_property(spark, attrs):
    pdf = pd.DataFrame({f"c{i}": pd.Series([v], dtype="object") for i, v in enumerate(attrs)})
    schema = ", ".join(f"c{i} string" for i in range(len(attrs)))
    df = spark.createDataFrame(pdf, schema=schema)
    got = df.select(
        serialize_attrs(*[F.col(f"c{i}") for i in range(len(attrs))]).alias("out")
    ).first()["out"]
    assert got == serialize_attrs_py(attrs)


def test_strip_separators(spark):
    vals = ["k#:#v#;#k2#:#v2", "a#;#b", None, "", "no sep"]
    df = spark.createDataFrame(pd.DataFrame({"s": pd.Series(vals, dtype="object")}), "s string")
    got = [r["out"] for r in df.select(strip_separators(F.col("s")).alias("out")).collect()]
    assert got == [strip_separators_py(v) for v in vals]


def test_attrs_raw_fixture_byte_identity(spark):
    """End-to-end: strip separators then serialize == golden oracle col."""
    df = generate_attrs_raw(spark, n=300)
    out = df.withColumn(
        "got", serialize_attrs(F.col("title"), strip_separators(F.col("pv_pairs")))
    )
    bad = out.filter(F.col("got") != F.col("expected_text")).count()
    assert bad == 0


def test_html_extraction_byte_identity(spark):
    from ember_spark.fixtures import generate_pages

    pages = generate_pages(spark, 30, seed=7)
    got = pages.withColumn("extracted", extract_text_from_html(F.col("html")))
    bad = got.filter(F.col("extracted") != F.col("text")).count()
    assert bad == 0


def test_concat_ws_would_be_wrong(spark):
    """Regression guard: the naive concat_ws drops the null slot."""
    df = spark.createDataFrame(
        pd.DataFrame({"a": pd.Series(["x"], dtype="object"), "b": pd.Series([None], dtype="object")}),
        "a string, b string",
    )
    naive = df.select(F.concat_ws(" ", "a", "b").alias("o")).first()["o"]
    ours = df.select(serialize_attrs(F.col("a"), F.col("b")).alias("o")).first()["o"]
    assert naive == "x"          # concat_ws eats the separator
    assert ours == "x "          # reference semantics keep it
    assert ours == serialize_attrs_py(["x", None])
