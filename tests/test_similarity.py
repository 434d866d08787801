import math

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ember_spark.functions.similarity import (
    cosine_sim,
    jaro_winkler_py,
    jaro_winkler_udf,
    token_jaccard,
)
from ember_spark.functions.tokenize import char_ngrams, tokenize_ws


def _jaccard_py(a, b):
    s1, s2 = set(a), set(b)
    u = s1 | s2
    return len(s1 & s2) / len(u) if u else 0.0


def test_token_jaccard_matches_reference_semantics(spark):
    cases = [
        (["a", "b", "c"], ["b", "c", "d"]),
        (["a"], ["a"]),
        (["a"], ["b"]),
        ([], []),
        (["a", "a", "b"], ["a", "b", "b"]),  # multiset input, set semantics
    ]
    pdf = pd.DataFrame({"a": [c[0] for c in cases], "b": [c[1] for c in cases]})
    df = spark.createDataFrame(pdf, "a array<string>, b array<string>")
    got = [r["j"] for r in df.select(token_jaccard(F.col("a"), F.col("b")).alias("j")).collect()]
    exp = [_jaccard_py(a, b) for a, b in cases]
    assert got == exp


def test_cosine_sim(spark):
    cases = [
        ([1.0, 0.0], [1.0, 1.0]),
        ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        ([0.0, 0.0], [1.0, 1.0]),
        ([1.0, -1.0], [-1.0, 1.0]),
    ]
    pdf = pd.DataFrame({"a": [c[0] for c in cases], "b": [c[1] for c in cases]})
    df = spark.createDataFrame(pdf, "a array<double>, b array<double>")
    got = [r["c"] for r in df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    for g, (a, b) in zip(got, cases):
        assert abs(g - cos(a, b)) < 1e-12


def test_jaro_winkler_known_values():
    # classic published examples
    assert abs(jaro_winkler_py("MARTHA", "MARHTA") - 0.9611111111) < 1e-6
    assert abs(jaro_winkler_py("DIXON", "DICKSONX") - 0.81333333) < 1e-6
    assert abs(jaro_winkler_py("DWAYNE", "DUANE") - 0.84) < 1e-6
    assert jaro_winkler_py("abc", "abc") == 1.0
    assert jaro_winkler_py("abc", "xyz") == 0.0
    assert jaro_winkler_py(None, "abc") == 0.0


def test_jaro_winkler_udf_matches_python(spark):
    pairs = [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("same", "same"), ("", "x"), (None, "y")]
    pdf = pd.DataFrame(
        {"l": pd.Series([p[0] for p in pairs], dtype="object"),
         "r": pd.Series([p[1] for p in pairs], dtype="object")}
    )
    df = spark.createDataFrame(pdf, "l string, r string")
    got = [x["jw"] for x in df.select(jaro_winkler_udf(F.col("l"), F.col("r")).alias("jw")).collect()]
    exp = [jaro_winkler_py(l, r) for l, r in pairs]
    assert got == exp


def test_tokenize_ws(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["A  b\tc", " lead trail ", ""]}), "t string"
    )
    got = [r["k"] for r in df.select(tokenize_ws(F.col("t")).alias("k")).collect()]
    assert got == [["a", "b", "c"], ["lead", "trail"], []]


def test_char_ngrams(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["abcd", "ab", "a"]}), "t string")
    got = [r["k"] for r in df.select(char_ngrams(F.col("t"), 2).alias("k")).collect()]
    assert got == [["ab", "bc", "cd"], ["ab"], ["a"]]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(alphabet="ab cde日本語xyz", max_size=12)),
            st.one_of(st.none(), st.text(alphabet="ab cde日本語xyz", max_size=12)),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_jaro_winkler_batch_matches_scalar(pairs):
    """The batch-vectorized JW (the scoring hot path) must be
    value-identical to the scalar oracle for arbitrary inputs —
    None, empty, CJK, dup chars, and the truncation path."""
    from ember_spark.functions.similarity import jaro_winkler_batch

    left = [p[0] for p in pairs]
    right = [p[1] for p in pairs]
    got = jaro_winkler_batch(left, right, max_len=8)
    for i, (a, b) in enumerate(pairs):
        want = jaro_winkler_py(
            a if a is None else a[:8], b if b is None else b[:8]
        )
        assert abs(got[i] - want) < 1e-12, (a, b, got[i], want)
