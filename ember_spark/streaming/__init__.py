from ember_spark.streaming.dedup_stream import streaming_exact_dedup, streaming_windowed_counts  # noqa: F401
from ember_spark.streaming.incremental_er import band_corpus, streaming_entity_assign  # noqa: F401
from ember_spark.streaming.sessionize import sessionize_batch, sessionize_stream  # noqa: F401
