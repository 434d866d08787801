import os

import pandas as pd
import pytest

from ember_spark.streaming.sessionize import sessionize_batch, sessionize_stream


def _events_pdf():
    return pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:10:00",
                    "2024-01-01 02:00:00",  # > 30min gap -> new session
                    "2024-01-01 02:05:00",
                    "2024-01-01 01:00:00",
                    "2024-01-01 01:20:00",
                ]
            ),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )


EXPECTED = {
    (1, "2024-01-01 00:00:00"): (2, 3.0),
    (1, "2024-01-01 02:00:00"): (2, 7.0),
    (2, "2024-01-01 01:00:00"): (2, 11.0),
}


def test_sessionize_batch(spark):
    df = spark.createDataFrame(_events_pdf())
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    assert got == EXPECTED


def test_sessionize_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    spark.createDataFrame(_events_pdf()).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    # a ProcessingTimeTimeout query never goes idle (timeout-only
    # micro-batches keep firing), so poll the sink for the expected row
    # count instead of processAllAvailable/awaitTermination
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT count(*) AS n FROM sess_out").first()["n"] >= 1:
            break
        time.sleep(2)
    q.stop()
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # within one micro-batch, closed sessions emit; the newest session
    # per user stays in state (would flush on timeout) — so the emitted
    # rows are the EXPECTED ones minus each user's last open session
    open_sessions = {(1, "2024-01-01 02:00:00"), (2, "2024-01-01 01:00:00")}
    assert got == {k: v for k, v in EXPECTED.items() if k not in open_sessions}
