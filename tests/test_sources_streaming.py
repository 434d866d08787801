import os

import pandas as pd
from pyspark.sql import functions as F

from ember_spark.operators.multimodal import extract_image_features
from ember_spark.sources.readers import (
    read_binary_files,
    read_csv_multichar_delim,
    read_jsonl,
    read_orc,
)
from ember_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
    streaming_windowed_counts,
)


def test_csv_multichar_delim(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("1@;@hello world@;@x@;@a@;@b\n2@;@with @; inside@;@y@;@c@;@d\n")
    df = read_csv_multichar_delim(
        spark, str(p), "@;@", ["id", "title", "c1", "c2", "c3"]
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["title"] == "hello world"
    assert rows["2"]["title"] == "with @; inside"  # partial delim chars survive
    assert rows["2"]["c3"] == "d"


def test_jsonl_with_schema_and_drop(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text('{"id": 1, "title": "t1", "nested": {"a": 1}}\n{"id": 2, "title": "t2", "nested": {"a": 2}}\n')
    df = read_jsonl(spark, str(p), schema="id long, title string, nested struct<a:int>", drop_columns=["nested"])
    assert df.columns == ["id", "title"]
    assert df.count() == 2


def test_orc_roundtrip_with_pruning_and_pushdown(spark, tmp_path):
    """ORC round-trips through Spark's native reader/writer, and both
    the column list and the predicate reach the scan node (same
    source-level pruning contract the parquet path asserts)."""
    from ember_spark.sources.writers import write_orc

    p = str(tmp_path / "t.orc")
    src = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    write_orc(src, p, partition_by=["k"])
    df = read_orc(spark, p, columns=["id", "v"]).filter(F.col("id") < 10)
    assert df.columns == ["id", "v"]
    assert df.count() == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "v:string" in plan.replace(" ", "")
    assert "id:bigint" in plan.replace(" ", "")
    # partition column k pruned away from the read schema entirely
    assert "k:int" not in plan.replace(" ", "")


def test_binary_files_listing(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"aaa")
    (tmp_path / "b.bin").write_bytes(b"bbbb")
    (tmp_path / "skip.txt").write_text("no")
    df = read_binary_files(spark, str(tmp_path), "*.bin")
    rows = sorted((os.path.basename(r["path"]), r["length"]) for r in df.collect())
    assert rows == [("a.bin", 3), ("b.bin", 4)]


def test_multimodal_plumbing(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "content": [b"imgbytes1", b"imgbytes1", None]})
    df = spark.createDataFrame(pdf, "doc_id long, content binary")
    out = extract_image_features(df, deterministic_fake=True, dim=16, partitions=2)
    rows = {r["doc_id"]: r["img_features"] for r in out.collect()}
    assert len(rows[1]) == 16
    assert rows[1] == rows[2]          # same bytes -> same features
    assert rows[3] == [0.0] * 16       # null payload -> zero vector


def test_multimodal_stub_raises_without_fake(spark):
    import pytest

    pdf = pd.DataFrame({"doc_id": [1], "content": [b"x"]})
    df = spark.createDataFrame(pdf, "doc_id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        extract_image_features(df, deterministic_fake=False).collect()


def test_streaming_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    os.makedirs(src)
    pdf = pd.DataFrame(
        {
            "warc_ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00"]
            ),
            "text": ["same text", "same text", "other text"],
            "lang": ["en", "en", "de"],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src, mode="overwrite")
    stream = (
        spark.readStream.schema("warc_ts timestamp, text string, lang string").parquet(src)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT text FROM dedup_out").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["other text", "same text"]


def test_streaming_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "stream_in2")
    os.makedirs(src)
    pdf = pd.DataFrame(
        {
            "warc_ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:05:00", "2024-01-01 00:15:00"]
            ),
            "text": ["a", "b", "c"],
            "lang": ["en", "en", "en"],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src, mode="overwrite")
    stream = (
        spark.readStream.schema("warc_ts timestamp, text string, lang string").parquet(src)
    )
    q = (
        streaming_windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (str(r["window_start"]), r["lang"]): r["n"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "en"): 2,
        ("2024-01-01 00:10:00", "en"): 1,
    }
