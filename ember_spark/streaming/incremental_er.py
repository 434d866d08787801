"""Streaming incremental entity resolution: assign newly ingested pages
to existing entities — or flag them as new — without re-running the
batch pipeline over the whole corpus.

The reference has no streaming at all (SURVEY.md §2.10); a continuously
crawled corpus needs exactly this operator: the batch ER pipeline
(`ERPipeline`) resolves the historical corpus once, and every new page
is then blocked + scored ONLY against its LSH band collisions.

Spark-first shape — no foreachBatch, the whole flow is one incremental
plan:

- stream side: the SAME prepare Arrow UDF as the batch pipeline
  (tokens -> embedding + MinHash signature + hashed token set), then
  `posexplode` of the banded signature keys,
- static side: the resolved corpus, banded once with the same keys
  (`band_corpus`) — a stream-static equi-join on the band key is
  natively supported by Structured Streaming and broadcasts/reuses the
  static side per micro-batch,
- features + matcher score exactly as the batch scorer (hashed-token
  Jaccard/containment + Jaro-Winkler in one Arrow batch UDF; cosine and
  length-ratio in whole-stage codegen), so stream and batch scores are
  IDENTICAL for the same pair,
- one windowed aggregation with a watermark picks arg-max entity per
  page (`max_by`), emitting (url, entity_id | NULL, best_score) when
  the window closes; NULL entity_id = no band collision scored above
  the threshold -> the page starts a new entity.

State is bounded by the watermark (one group per page per window); the
static banded corpus is the only large operand and it is read-only.
Periodically fold the accumulated new pages into the corpus with the
batch pipeline and restart the stream — the standard lambda handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ember_spark.functions.hashing import lsh_band_keys, make_prepare_udf
from ember_spark.operators.scoring import LogisticMatcher, make_pair_text_features_udf
from ember_spark.functions.tokenize import tokenize_auto


def band_corpus(
    prepared: DataFrame,
    entities: DataFrame,
    bands: int = 16,
    rows: int = 4,
) -> DataFrame:
    """Static side: one row per (band key, corpus doc) with the scoring
    payload and the doc's resolved entity id. Build once from the batch
    pipeline's `prepared` + `entities` outputs and persist/bucket it."""
    ent = entities.select("url", "entity_id")
    # no c_emb: f_cos is recomputed from c_th inside the feature UDF
    # (emb_from_th), mirroring the batch scorer's slimmed pair payload
    return (
        prepared.join(ent, "url")
        .select(
            F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band_key"),
            F.col("rid").alias("c_rid"),
            F.col("entity_id"),
            F.substring("text", 1, 80).alias("c_text"),
            F.length("text").cast("double").alias("c_len"),
            F.col("th").alias("c_th"),
        )
    )


def streaming_entity_assign(
    pages: DataFrame,
    banded_corpus: DataFrame,
    matcher: LogisticMatcher,
    embedding_dim: int = 64,
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float | None = None,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    hot_tokens: list[str] | None = None,
) -> DataFrame:
    """pages stream (url, warc_ts, text, lang) -> assignment stream
    (window, url, entity_id nullable, best_score nullable).

    `threshold` defaults to the matcher's CALIBRATED threshold so the
    stream merges exactly the pairs the batch pipeline would.

    `hot_tokens` must be the SAME census list batch `prepare` removed
    from its blocking token set (`ERPipeline.hot_token_list`) — the
    corpus signatures were minhashed over hot-FILTERED tokens, so the
    stream side must filter identically or an exact copy of a corpus
    page hashes to different band keys and can miss every bucket.
    """
    if threshold is None:
        threshold = matcher.threshold
    prep = make_prepare_udf(embedding_dim, num_hashes)
    block_toks = (
        F.array_except(F.col("tokens"), F.lit(hot_tokens))
        if hot_tokens
        else F.col("tokens")
    )
    s = (
        pages.withColumn("tokens", tokenize_auto(F.col("text"), F.col("lang")))
        .withColumn("_p", prep(F.col("tokens"), block_toks))
        .select(
            F.col(ts_col).alias("ts"),
            "url",
            F.substring("text", 1, 80).alias("s_text"),
            F.length("text").cast("double").alias("s_len"),
            F.col("_p.th").alias("s_th"),
            F.explode(lsh_band_keys(F.col("_p.sig"), bands, rows)).alias("band_key"),
        )
    )
    # a page sharing k band keys with a corpus doc would otherwise be
    # feature-scored k times (up to `bands`x redundant Arrow + JW work
    # per micro-batch) before max_by absorbs the copies — dedup the
    # (page, corpus doc) pair BEFORE the feature UDF. The watermark is
    # set upstream of the dedup so its state is evicted by event time.
    cands = (
        s.withWatermark("ts", watermark)
        .join(banded_corpus, "band_key", "left_outer")
        .dropDuplicates(["ts", "url", "c_rid"])
    )
    feats_udf = make_pair_text_features_udf(emb_dim=embedding_dim)
    mx = F.greatest("s_len", "c_len")
    mn = F.least("s_len", "c_len")
    scored = (
        cands.withColumn(
            "_f",
            feats_udf(F.col("s_text"), F.col("c_text"), F.col("s_th"), F.col("c_th")),
        )
        .select(
            "ts",
            "url",
            "entity_id",
            F.col("_f.f_jaccard").alias("f_jaccard"),
            F.col("_f.f_containment").alias("f_containment"),
            F.col("_f.f_jw").alias("f_jw"),
            F.col("_f.f_cos").alias("f_cos"),
            # batch parity: both-empty -> 1.0 exactly like pair_features
            # and the arrow scorer; a null (no band match) row's score
            # is nulled via entity_id anyway
            F.when(mx.isNull(), F.lit(None).cast("double"))
            .when(mx == 0, F.lit(1.0))
            .otherwise(mn / mx)
            .alias("f_len_ratio"),
        )
    )
    scored = scored.withColumn(
        "score",
        F.when(F.col("entity_id").isNull(), F.lit(None).cast("double")).otherwise(
            matcher.score_col()
        ),
    )
    agg = (
        scored.groupBy(F.window("ts", window).alias("w"), "url")
        .agg(
            F.max_by("entity_id", "score").alias("best_entity"),
            F.max("score").alias("best_score"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        "url",
        F.when(F.col("best_score") >= threshold, F.col("best_entity")).alias(
            "entity_id"
        ),
        "best_score",
    )
