"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §2.10) — its `warc_ts`
exists only as an input column. These operators are the additions a
continuously-ingested web corpus needs: streaming exact dedup
(dropDuplicatesWithinWatermark on the content hash) and windowed
ingest counts. Both are driven to completion synchronously in tests
via the memory sink + processAllAvailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact-content duplicates within the watermark horizon —
    bounded state, late rows beyond the watermark age out."""
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_windowed_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "lang",
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window per-key ingest counts with late-data watermarking."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )
