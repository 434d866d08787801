import pandas as pd
from pyspark.sql import functions as F

from ember_spark.operators.textstats import (
    add_lang_id,
    fingerprint,
    quality_features,
    token_count,
)


def test_lang_id(spark):
    rows = [
        (1, "the cat sat on the mat and it is for you"),
        (2, "der hund ist nicht mit der katze und das haus"),
        (3, "el perro y la casa de los gatos en un pueblo es"),
        (4, "你好世界这是中文文本内容测试"),
        (5, "zzz qqq www"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))
    got = {r["id"]: r["lang_pred"] for r in add_lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "zh", 5: "und"}


def test_quality_features(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "text": ["the quick brown fox is here", "!!! ??? ..."]})
    )
    rows = {r["id"]: r for r in quality_features(df).collect()}
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["quality_score"] > rows[2]["quality_score"]
    assert rows[2]["punct_ratio"] > 0.5


def test_token_count(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "text": ["hello world, it's 42"]}))
    r = token_count(df).first()
    assert r["ws_tokens"] == 4
    # pieces: hello | world | , | it | ' | s | 42
    assert r["word_pieces"] == 7
    assert r["bpe_estimate"] == 5


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2, 3], "text": ["b a c", "c  B a", "different words here"]}
        )
    )
    got = [r["fingerprint"] for r in fingerprint(df).orderBy("id").collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]
