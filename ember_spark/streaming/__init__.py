from ember_spark.streaming.dedup_stream import streaming_exact_dedup, streaming_windowed_counts  # noqa: F401
