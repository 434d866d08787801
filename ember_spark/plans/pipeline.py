"""End-to-end entity-resolution pipeline (SURVEY.md §7.1 step 3-7).

pages(url, warc_ts, html, text, lang)
  -> extract (byte-identical text; X1+X3 semantics)
  -> tokenize (X4; lang-aware)
  -> block (multi-key: normalized url path + MinHash-LSH; J1/J2)
  -> score (features X5/JW/cosine -> broadcast logistic matcher; M3/M4)
  -> cluster (large-star/small-star connected components)
  -> entities(url, entity_id)

Every stage is DataFrame -> DataFrame; with a `StageManifest` the
stages materialize + resume idempotently.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ember_spark.functions.hashing import make_hash_embedding_udf, make_prepare_udf
from ember_spark.functions.similarity import jaro_winkler_udf
from ember_spark.functions.text import extract_text_from_html
from ember_spark.functions.tokenize import tokenize_auto
from ember_spark.operators.blocking import (
    attach_pair_payload,
    attach_pair_payload_bucketed,
    candidate_pairs,
    ensure_parallelism,
    salted_repartition,
)
from ember_spark.operators.clustering import connected_components
from ember_spark.operators.scoring import (
    FEATURES,
    FEATURES_CHEAP,
    CascadeMatcher,
    LogisticMatcher,
    make_pair_text_features_udf,
    with_pair_overlap,
    pair_features,
)

#: default matcher weights over
#: [f_jaccard, f_containment, f_jw, f_cos, f_len_ratio] — a conservative
#: prior; `ERPipeline.fit_matcher` retrains on labeled pairs.
DEFAULT_WEIGHTS = [8.0, 4.0, 2.0, 2.0, 1.0]
DEFAULT_BIAS = -9.5
#: cheap-stage prior over [f_jaccard, f_containment, f_cos, f_len_ratio]
#: (full prior minus the JW term, bias re-centered)
DEFAULT_CHEAP_WEIGHTS = [8.0, 4.0, 2.0, 1.0]
DEFAULT_CHEAP_BIAS = -8.1


@dataclass
class PipelineConfig:
    # b=16, r=4: P(candidate | jaccard s) = 1-(1-s^4)^16 — 0.98 at
    # s=0.7, 0.88 at s=0.6, 0.12 at s=0.3: near-certain recall for true
    # duplicates (plus transitive closure and the url key), an order of
    # magnitude fewer hard-negative collisions than r=3
    num_hashes: int = 64
    bands: int = 16
    rows: int = 4
    block_cap: int = 1000
    embedding_dim: int = 64
    use_url_key: bool = True
    score_partitions: int | None = None  # None -> spark.sql.shuffle.partitions
    # skew-key salting of the scored pair table. Skew is already bounded
    # upstream by three mechanisms (hot-token census removal, the
    # block-size cap — no id can appear in more than cap*bands pairs —
    # and AQE skew-join splitting at runtime), so the explicit salted
    # repartition is OFF by default: it costs a full extra shuffle of
    # the widest table in the job. Set salt>0 for corpora with
    # pathological key distributions that defeat the cap.
    salt: int = 0
    # tokens present in > this fraction of docs are dropped from the
    # BLOCKING token set (df census -> broadcast literal). Stopword-like
    # tokens otherwise inflate MinHash similarity corpus-wide and blow
    # up candidate counts quadratically. Features still see all tokens.
    hot_token_df_frac: float = 0.05
    hot_token_max: int = 2000  # safety cap on the broadcast literal
    # the census tokenizes its input — over the FULL corpus that is a
    # second complete tokenize pass before prepare's own (profiled at
    # ~50% of the whole prepare stage). Corpora larger than this many
    # docs census a deterministic hash-sample of ~this size instead:
    # a df-fraction estimate from >=250k docs has std <= 0.1% absolute
    # (sqrt(p(1-p)/n) at p=0.05), so only tokens within ~0.3% of the
    # threshold can flip — and the hot set is a blocking-perf guard,
    # not a correctness contract (features see all tokens; candidate
    # recall is backstopped by the exact keys + transitive closure).
    # At 10^12 docs an exact stopword census is not a sane plan; the
    # sample IS the production design. 0 restores the exact census.
    # Deterministic (xxhash64 of the record key), so blocking remains
    # reproducible run-to-run and batch/streaming stay consistent.
    hot_token_census_docs: int = 250_000
    # payload-attach join strategy for scoring (guide §3.1):
    #  - None (default): AUTO — broadcast the (column-pruned, slim)
    #    corpus payload when it counts <= attach_pair_payload's
    #    broadcast_max_rows (2M), else shuffle joins. Broadcasting
    #    replaces TWO shuffles of the pair table (the widest table of
    #    the job) with one build of the slim payload; re-measured in
    #    round 6 at 107k docs/236k pairs the broadcast attach is ~2x
    #    the shuffle attach's throughput cold (fewer sort/exchange
    #    stages to JIT) and never slower warm. The gate is a row COUNT
    #    of the payload side (one narrow job, trivial when the caller
    #    persisted the prepared table, as the pipeline does), so at web
    #    scale (>2M docs) the joins fall back to shuffles — the
    #    scale-adaptive shape the optimization guide asks for, not a
    #    local-mode constant.
    #  - False / True: force shuffle / broadcast unconditionally.
    broadcast_payload: bool | None = None
    # payload-attach strategy for the scoring join (perf-only — output
    # is identical, so it is excluded from the stage fingerprints):
    #  - "shuffle" (default): attach_pair_payload — sort-merge/broadcast
    #    joins, zero setup cost, right for one-shot small/medium runs.
    #  - "bucketed": attach_pair_payload_bucketed — corpus and pair
    #    table written ONCE as bucketed+sorted tables on the id so both
    #    payload joins run bucket-to-bucket with no exchange; the
    #    10^12-pair scale path, where re-shuffling the pair table twice
    #    per run dominates. The bucketed tables double as resumable
    #    stage outputs (set payload_table_location to durable storage).
    payload_mode: str = "shuffle"
    payload_buckets: int = 64
    payload_table_location: str | None = None
    # hot-KEY spreading of the payload-attach joins (skew.salted_join;
    # perf-only — the joined rows are identical, so like payload_mode it
    # is excluded from the stage fingerprints). payload_salt > 1 arms
    # it; payload_salt_trigger_frac > 0 adds a one-job census on the
    # persisted pair table and salts only sides whose single hottest id
    # exceeds that fraction of pairs (a hub page — one doc in 30% of
    # pairs — otherwise lands on ONE reducer of the fat-side shuffle
    # join, a straggler neither cap_hot_blocks — which must not drop
    # scored pairs — nor AQE — which cannot split a shuffled-hash
    # join's hot task — protects against). Uniform corpora keep the
    # plain join and pay only the census.
    payload_salt: int = 0
    payload_salt_trigger_frac: float = 0.25
    matcher: LogisticMatcher = field(
        default_factory=lambda: LogisticMatcher(DEFAULT_WEIGHTS, DEFAULT_BIAS)
    )
    # feature computation mode:
    #  - "arrow" (default, the north-star shape): ONE Arrow batch UDF
    #    computes all five features per pair. Feature work runs in
    #    Python worker processes — on a cluster each executor brings
    #    its own workers, so the dominant scoring cost scales with the
    #    executor count instead of competing inside the JVM for the
    #    shuffle machinery.
    #  - "cascade": JVM-native cheap model gates the Python Jaro-Winkler
    #    stage — fastest absolute wall when Python workers are the
    #    scarce resource.
    #  - "native": single-stage JVM features + Python JW for every pair.
    feature_mode: str = "arrow"
    use_cascade: bool = True  # used by the "cascade"/"native" modes
    cascade: CascadeMatcher = field(
        default_factory=lambda: CascadeMatcher(
            cheap=LogisticMatcher(DEFAULT_CHEAP_WEIGHTS, DEFAULT_CHEAP_BIAS),
            full=LogisticMatcher(DEFAULT_WEIGHTS, DEFAULT_BIAS),
            low=0.1,
            high=0.9,
        )
    )


def url_path_key(url) -> F.Column:
    """Normalized-url block key: scheme+query stripped, trailing segment
    dropped — near-duplicate pages of one item share the path prefix."""
    no_scheme = F.regexp_replace(url, r"^https?://", "")
    no_query = F.regexp_replace(no_scheme, r"[?#].*$", "")
    return F.regexp_replace(no_query, r"/[^/]*$", "")


class ERPipeline:
    def __init__(self, spark: SparkSession, config: PipelineConfig | None = None, manifest=None):
        self.spark = spark
        self.cfg = config or PipelineConfig()
        self.manifest = manifest
        # table prefixes created by score(payload_mode='bucketed'),
        # pending cleanup_bucketed_tables()
        self._bucketed_prefixes: list[str] = []

    # ------------------------------------------------------------ stages
    def extract(self, pages: DataFrame) -> DataFrame:
        """url/text/lang docs; when `text` is absent, extract from html
        byte-identically (tested vs the python oracle)."""
        cols = set(pages.columns)
        text = F.col("text") if "text" in cols else extract_text_from_html(F.col("html"))
        return pages.select(F.col("url"), text.alias("text"), F.col("lang"))

    def prepare(self, docs: DataFrame, slim: bool | None = None) -> DataFrame:
        """tokens + hashing-trick embedding + blocking token set + rid.

        `slim` (default: True exactly when `feature_mode == "arrow"`):
        omit the `tokens` and `emb` columns from the output. In arrow
        mode NOTHING downstream reads them — scoring ships `th` and
        recomputes the embedding from it (emb_from_th), blocking reads
        `sig` — yet they were the WIDEST columns of the persisted/
        checkpointed prepared table (a ~40-element string array plus
        dim*4 bytes per doc): materializing them was pure memory-
        bandwidth tax on the stage profiled as the pipeline's worst
        wide-parallelism scaler. The slim kernel also skips computing
        the embedding per batch. Pass slim=False to keep the full
        schema (required by the JVM feature modes — score() raises if
        given a slim table in those modes).

        `rid` is a 64-bit hash of the url used as the record key through
        blocking/scoring/clustering: every downstream shuffle, sort and
        checkpoint then carries an 8-byte long instead of a ~40-byte
        url string — on bandwidth-bound stages that is the difference
        between scaling and thrashing. Collision odds are n^2/2^65
        (~5e-8 at 1.4M docs); at true 10^12 scale swap in a 128-bit
        (two-hash) rid — the dataflow is unchanged. urls re-attach by a
        (rid, url) join at the very end (`cluster`).

        The MinHash signature is computed over the blocking token set =
        tokens minus corpus-hot tokens (document frequency above
        cfg.hot_token_df_frac). The df census is one map-side-combinable
        groupBy; the hot set is tiny by construction (at most 1/frac
        tokens can exceed frac of docs) and bakes into the prepare UDF
        closure as u64 hashes — no extra join, no array_except column,
        no second token-string array through Arrow.

        The embedding and the MinHash signature are computed in ONE
        Arrow pass (`make_prepare_udf` / `prepare_batch`): the JVM HOF
        min-aggregate signature is interpreted per element and was
        blocking's worst scaler; numpy affine-permutation MinHash over
        once-hashed tokens is faster and leaves blocking with integer
        band hashing only.
        """
        # ensure_parallelism: the tokenize + one-pass prepare UDF are the
        # pipeline's dominant per-doc cost and must not inherit a narrow
        # single-file scan's partitioning (no-op when the source already
        # has >= parallelism partitions — the production case).
        base = ensure_parallelism(docs).select(
            "url",
            "text",
            "lang",
            tokenize_auto(F.col("text"), F.col("lang")).alias("tokens"),
        )
        # census runs on the UDF-free projection — the prepare UDF must
        # not be evaluated an extra time just to count token frequencies.
        # The hot set bakes into the UDF closure as u64 hashes: no
        # block_tokens column — the old array_except projection shipped
        # a second copy of every token string through Arrow AND sat as
        # dead width in the persisted/checkpointed prepared table.
        if slim is None:
            slim = self.cfg.feature_mode == "arrow"
        hot = self._hot_tokens(base)
        prep = make_prepare_udf(
            self.cfg.embedding_dim,
            self.cfg.num_hashes,
            hot_tokens=hot,
            include_emb=not slim,
        )
        cols = [
            F.xxhash64("url").alias("rid"),
            "url",
            "text",
            "lang",
        ]
        if not slim:
            cols.append(F.col("tokens"))
        out = base.withColumn("_prep", prep(F.col("tokens")))
        if not slim:
            cols.append(F.col("_prep.emb").alias("emb"))
        cols += [
            F.col("_prep.sig").alias("sig"),
            F.col("_prep.th").alias("th"),
        ]
        return out.select(*cols)

    def hot_token_list(self, docs: DataFrame) -> list[str]:
        """The corpus-hot tokens `prepare` removes from the blocking
        token set — public so consumers that must block COMPATIBLY with
        this corpus's signatures (e.g. `streaming_entity_assign`) can
        filter identically."""
        base = docs.select(
            "url", tokenize_auto(F.col("text"), F.col("lang")).alias("tokens")
        )
        return self._hot_tokens(base)

    def _hot_tokens(self, base: DataFrame) -> list[str]:
        if not self.cfg.hot_token_df_frac:
            return []
        target = self.cfg.hot_token_census_docs
        if target:
            # adaptive hash-sample (see PipelineConfig.hot_token_census_docs):
            # the row count comes from a narrow no-tokenize scan (the
            # tokens projection prunes away under count()); corpora at
            # or below the target keep the exact census — every test
            # corpus does, so small-scale behavior is unchanged.
            key = "url" if "url" in base.columns else base.columns[0]
            n = base.select(key).count()
            if n > target:
                # ceil, not floor: floor gave k=1 (no sampling at all)
                # for target < n < 2*target, silently paying the full
                # second tokenize pass the knob exists to avoid; ceil
                # keeps the expected sample at or below the target for
                # every n > target.
                k = -(-n // target)
                base = base.filter(
                    F.pmod(F.xxhash64(F.col(key)), F.lit(k)) == 0
                )
        # ONE job computes the (sampled) doc count AND the df census: a
        # null marker element is prepended to every doc's distinct-token
        # array, so the null group's count is exactly n_docs — the
        # separate count() pass (a full extra tokenize scan) is gone.
        census = (
            base.select(
                F.explode(
                    F.concat(
                        F.array(F.lit(None).cast("string")),
                        F.coalesce(F.array_distinct("tokens"), F.array()),
                    )
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        # the null marker has df = n_docs >= any token's df, so it is
        # always inside the top (hot_token_max + 1) slice; nulls-first
        # tie-break pins it ahead of any token present in every doc
        top = (
            census.orderBy(F.col("df").desc(), F.col("tok").asc_nulls_first())
            .limit(self.cfg.hot_token_max + 1)
            .collect()
        )
        n_docs = next((r["df"] for r in top if r["tok"] is None), 0)
        min_df = max(int(n_docs * self.cfg.hot_token_df_frac), 2)
        return [r["tok"] for r in top if r["tok"] is not None and r["df"] >= min_df]

    def block(self, prepared: DataFrame) -> DataFrame:
        """Candidate pairs from a prepared table.

        Contract note (round 4 change): a legacy `block_tokens` column
        on a no-sig input is NO LONGER honored — the hot-token census
        runs on `tokens` directly and the exclusion bakes into the
        MinHash. Nothing in-repo produces `block_tokens` anymore; an
        external caller that pre-filtered into it should pass the
        filtered array AS `tokens` (raising here would break legitimate
        inputs that happen to carry an unrelated column of that name).
        """
        keys = [url_path_key(F.col("url"))] if self.cfg.use_url_key else []
        has_sig = "sig" in prepared.columns
        id_col = "rid" if "rid" in prepared.columns else "url"
        if not has_sig:
            # fallback for a prepared input that skipped prepare(): the
            # MinHash here must see the same hot-token exclusion the
            # prepare() signature bakes in, or corpus-hot tokens recreate
            # exactly the giant-block blowup the census exists to prevent
            hot = self._hot_tokens(prepared)
            if hot:
                prepared = prepared.withColumn(
                    "tokens", F.array_except(F.col("tokens"), F.array(*[F.lit(t) for t in hot]))
                )
        return candidate_pairs(
            prepared,
            id_col=id_col,
            tokens_col=None if has_sig else "tokens",
            exact_key_exprs=keys,
            num_hashes=self.cfg.num_hashes,
            bands=self.cfg.bands,
            rows=self.cfg.rows,
            cap=self.cfg.block_cap,
            sig_col="sig" if has_sig else None,
            # pair generation is grouped combinations over ONE exchange
            # of the banded (id, long) table — no self-join, so the
            # lineage (the Arrow prepare UDF when unpersisted) runs once
            # and nothing needs checkpointing (materialize is a no-op)
            materialize=True,
        )

    def score(self, pairs: DataFrame, prepared: DataFrame) -> DataFrame:
        parts = self.cfg.score_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        # ship only what the features read: text truncated to the JW
        # window — halves the pair-shuffle width. text_len carries the
        # FULL pre-truncation length so f_len_ratio sees the same
        # distribution at inference as at training (no train/serve skew)
        id_col = "rid" if "rid" in prepared.columns else "url"
        # arrow mode ships the hashed token set (8-byte longs, C-speed
        # intersect in the UDF); the JVM feature modes need the strings
        use_th = self.cfg.feature_mode == "arrow" and "th" in prepared.columns
        tok_col = "th" if use_th else "tokens"
        if tok_col == "tokens" and "tokens" not in prepared.columns:
            raise ValueError(
                "score() needs 'th' or 'tokens' on the prepared table;"
                " this one has neither (a slim table with th dropped?)."
                " Re-run prepare(docs, slim=False) or keep 'th'."
            )
        # arrow mode never ships the embedding: f_cos is recomputed
        # from `th` inside the feature UDF (emb_from_th — the embedding
        # is a pure function of th), cutting ~dim*4 bytes per side off
        # the pair shuffle, the widest shuffle of the job
        slim_cols = [
            F.substring("text", 1, 80).alias("text"),
            F.length("text").cast("double").alias("text_len"),
            F.col(tok_col),
        ]
        payload_cols = ["text", "text_len", tok_col]
        # the arrow scorer never reads emb_l/emb_r (f_cos is recomputed
        # inside the UDF from raw tokens/th), so emb ships ONLY for the
        # JVM feature modes — even in the arrow-without-th corner, where
        # appending it would push dead dim*4 bytes per side through the
        # widest shuffle of the job
        if self.cfg.feature_mode != "arrow":
            missing = {"emb", "tokens"} - set(prepared.columns)
            if missing:
                raise ValueError(
                    f"feature_mode={self.cfg.feature_mode!r} needs the"
                    f" {sorted(missing)} column(s), but this prepared table"
                    " was built slim (prepare(slim=True) — the arrow-mode"
                    " default). Re-run prepare(docs, slim=False)."
                )
            slim_cols.append(F.col("emb"))
            payload_cols.append("emb")
        slim = prepared.select(id_col, *slim_cols)
        if self.cfg.payload_mode == "bucketed":
            # record the generated prefix so the tables can be dropped
            # once the scored output is materialized — otherwise every
            # run leaks the full bucketed pair table into the warehouse
            import uuid

            prefix = f"ember_bucketed_{uuid.uuid4().hex[:12]}"
            self._bucketed_prefixes.append(prefix)
            withpay = attach_pair_payload_bucketed(
                pairs, slim, id_col, payload_cols,
                buckets=self.cfg.payload_buckets,
                table_prefix=prefix,
                location=self.cfg.payload_table_location,
            )
        else:
            withpay = attach_pair_payload(
                pairs, slim, id_col, payload_cols,
                broadcast_payload=self.cfg.broadcast_payload,
                salt=self.cfg.payload_salt,
                salt_trigger_frac=self.cfg.payload_salt_trigger_frac,
            )
        # optional skew-key salting: spread any hot key's pairs before
        # the Python-bearing feature stage (see PipelineConfig.salt)
        if self.cfg.salt:
            withpay = salted_repartition(withpay, "id_l", "id_r", parts, self.cfg.salt)
        out_cols = ["id_l", "id_r", *FEATURES, "score", "prediction"]
        if self.cfg.feature_mode == "arrow":
            # jaccard/containment run JVM-side (codegen array_intersect
            # over the hashed-token payload — pair_overlap_cols, exact
            # same values); the Arrow kernel keeps only the two batch-
            # vectorized metrics (JW, cos), so no per-pair Python
            # remains anywhere in scoring
            feats_udf = make_pair_text_features_udf(
                emb_dim=self.cfg.embedding_dim, include_overlap=False
            )
            mx = F.greatest("text_len_l", "text_len_r")  # full-text lens
            mn = F.least("text_len_l", "text_len_r")
            feats = with_pair_overlap(
                withpay,
                F.col(f"{tok_col}_l"), F.col(f"{tok_col}_r"),
                distinct=(tok_col == "tokens"),
            ).withColumn(
                "_f",
                feats_udf(
                    F.col("text_l"), F.col("text_r"),
                    F.col(f"{tok_col}_l"), F.col(f"{tok_col}_r"),
                ),
            ).select(
                "id_l",
                "id_r",
                "f_jaccard",
                "f_containment",
                F.col("_f.f_jw").alias("f_jw"),
                F.col("_f.f_cos").alias("f_cos"),
                F.when(mx == 0, F.lit(1.0)).otherwise(mn / mx).alias("f_len_ratio"),
            )
            return self.cfg.matcher.predict(feats).select(*out_cols)
        if not self.cfg.use_cascade or self.cfg.feature_mode == "native":
            feats = pair_features(
                withpay, emb_dim=self.cfg.embedding_dim, emb_normalized=True,
                len_l="text_len_l", len_r="text_len_r",
            )
            return self.cfg.matcher.predict(feats).select(
                "id_l", "id_r",
                *[c for c in feats.columns if c.startswith("f_")],
                "score", "prediction",
            )

        cm = self.cfg.cascade
        cheap_feats = pair_features(
            withpay,
            emb_dim=self.cfg.embedding_dim,
            emb_normalized=True,
            include_jw=False,
            len_l="text_len_l", len_r="text_len_r",
        )
        # materialize stage 1 once (both cascade branches scan it), but
        # SLIM: ids + the JW text window + cheap features only. The
        # token arrays and embeddings are spent after the cheap features
        # — carrying them through the checkpoint made its write the
        # memory-bandwidth bottleneck of the whole scoring stage
        # EAGER: both cascade branches scan stage1 concurrently — lazy
        # checkpointing here makes their tasks convoy on block-store
        # locks at wide parallelism (measured +30-100% wall at 8 cores)
        stage1 = (
            cm.predict_cheap(cheap_feats)
            .select(
                "id_l", "id_r", "text_l", "text_r",
                *FEATURES_CHEAP, "cheap_score", "uncertain",
            )
            .localCheckpoint()
        )
        out_cols = ["id_l", "id_r", *FEATURES, "score", "prediction"]
        certain = (
            stage1.filter(~F.col("uncertain"))
            .withColumn("f_jw", F.lit(None).cast("double"))
            .withColumn("score", F.col("cheap_score"))
            .withColumn(
                "prediction",
                (F.col("cheap_score") > F.lit(cm.cheap.threshold)).cast("int"),
            )
            .select(*out_cols)
        )
        uncertain = (
            stage1.filter(F.col("uncertain"))
            .withColumn("f_jw", jaro_winkler_udf(F.col("text_l"), F.col("text_r")))
        )
        uncertain = cm.full.predict(uncertain).select(*out_cols)
        return certain.unionByName(uncertain)

    def cluster(self, scored: DataFrame, prepared: DataFrame) -> DataFrame:
        edges = scored.filter(F.col("prediction") == 1).select("id_l", "id_r")
        # assume_distinct: scored pairs are canonical (id_l < id_r) and
        # dedup'd at blocking — CC skips its iteration-0 dedup shuffle.
        # members_only: the left join below reconstructs every
        # self-mapping, so CC skips its nodes/selfmap assembly shuffles.
        comp = connected_components(
            edges, "id_l", "id_r", assume_distinct=True, members_only=True
        )
        id_col = "rid" if "rid" in prepared.columns else "url"
        # ONE left join from the full id set: a matched id takes its
        # component, an unmatched id (never-paired singleton) maps to
        # itself — value-identical to the former anti-join + union +
        # url-re-attach join, two fewer shuffled operators on the
        # widest table of the stage (every doc id flows through here)
        base = prepared.select(
            F.col(id_col).alias("id"),
            F.col("url") if id_col == "rid" else F.col(id_col).alias("url"),
        )
        return base.join(comp, "id", "left").select(
            "url", F.coalesce(F.col("component"), F.col("id")).alias("entity_id")
        )

    # ------------------------------------------------------------- runs
    def run(self, pages: DataFrame, input_fp: str | None = None) -> dict[str, DataFrame]:
        """Full pipeline; returns every stage's DataFrame. With a
        manifest, each stage checkpoints and resumes idempotently.

        Stage fingerprints CHAIN: fp(stage_k) = h(fp(stage_{k-1}) | name),
        seeded with the config AND an input fingerprint — rerunning at
        the same checkpoint root with a different input invalidates
        every downstream checkpoint instead of silently serving stale
        stage outputs. `input_fp` defaults to the semantic hash of the
        input plan (which covers source paths/plan shape, not file
        contents — pass an explicit content fingerprint, e.g. an
        Iceberg snapshot id, when inputs mutate in place).
        """
        fps = self.stage_fingerprints(pages, input_fp)

        def stage(name: str, build):
            if self.manifest is None:
                return build()
            return self.manifest.run_stage(name, fps[name], build)

        docs = stage("extract", lambda: self.extract(pages))
        prepared = stage("prepare", lambda: self.prepare(docs))
        if self.manifest is None:
            # downstream stages reference `prepared` three times
            # (block, score payload, cluster's singleton/url joins) and
            # `scored` twice — without a manifest materializing stages,
            # persist (MEMORY_AND_DISK) or each reference re-runs the
            # upstream pipeline
            prepared = prepared.persist()
        pairs = stage("block", lambda: self.block(prepared))
        scored = stage("score", lambda: self.score(pairs, prepared))
        if self.manifest is not None:
            # the manifest wrote 'score' to parquet, so the bucketed
            # payload tables (if any) are no longer referenced — drop
            # them here instead of leaking them into the warehouse.
            # Without a manifest `scored` is still lazy over the tables;
            # the caller owns cleanup_bucketed_tables() after consuming.
            self.cleanup_bucketed_tables()
        if self.manifest is None:
            scored = scored.persist()
        entities = stage("entities", lambda: self.cluster(scored, prepared))
        return {
            "docs": docs,
            "prepared": prepared,
            "pairs": pairs,
            "scored": scored,
            "entities": entities,
        }

    def cleanup_bucketed_tables(self) -> None:
        """Drop the bucketed payload tables created by
        score(payload_mode='bucketed'). Safe once the scored output is
        materialized; run() calls this automatically when a manifest
        checkpoints the score stage."""
        from ember_spark.operators.blocking import drop_bucketed_tables

        while self._bucketed_prefixes:
            drop_bucketed_tables(self.spark, self._bucketed_prefixes.pop())

    #: pipeline stage order (fingerprints chain in this order)
    STAGES = ["extract", "prepare", "block", "score", "entities"]

    def stage_fingerprints(
        self, pages: DataFrame | None = None, input_fp: str | None = None
    ) -> dict[str, str]:
        """Chained per-stage fingerprints seeded by (config, input)."""
        import hashlib

        # the model is part of the config: a retrained matcher must not
        # be served stale 'score'/'entities' checkpoints
        model_fp = hashlib.blake2b(
            (self.cfg.matcher.to_json() + self.cfg.cascade.to_json()).encode(),
            digest_size=4,
        ).hexdigest() if self.cfg.matcher.weights is not None else "prior"
        # every OUTPUT-affecting knob must be here: a stale-checkpoint
        # serve after a config change is exactly the failure the chained
        # fingerprints exist to close. Perf-only fields (salt,
        # score_partitions, broadcast_payload) are deliberately excluded
        # so a perf retune can reuse checkpoints.
        cfg_fp = (
            f"h{self.cfg.num_hashes}b{self.cfg.bands}r{self.cfg.rows}"
            f"c{self.cfg.block_cap}d{self.cfg.embedding_dim}m{model_fp}"
            f"u{int(self.cfg.use_url_key)}t{self.cfg.hot_token_df_frac}"
            f"x{self.cfg.hot_token_max}f{self.cfg.feature_mode}"
            f"k{int(self.cfg.use_cascade)}s{self.cfg.hot_token_census_docs}"
        )
        if input_fp is None:
            try:
                input_fp = f"sem{pages.semanticHash()}" if pages is not None else "none"
            except Exception:
                input_fp = "unknown"
        chain = hashlib.blake2b(
            f"{cfg_fp}|in:{input_fp}".encode(), digest_size=8
        ).hexdigest()
        fps = {}
        for name in self.STAGES:
            chain = hashlib.blake2b(f"{chain}|{name}".encode(), digest_size=8).hexdigest()
            fps[name] = chain
        return fps

    def fit_matcher(self, labeled_pairs: DataFrame) -> LogisticMatcher:
        """Train the broadcast matcher on an ember-shaped labeled pair
        table (url_left/right, text_left/right, label)."""
        emb = make_hash_embedding_udf(self.cfg.embedding_dim)
        sides = labeled_pairs.select(
            F.col("text_left").alias("text_l"),
            F.col("text_right").alias("text_r"),
            F.col("lang_left").alias("lang_l"),
            F.col("lang_right").alias("lang_r"),
            F.col("label"),
        )
        sides = (
            sides.withColumn("tokens_l", tokenize_auto(F.col("text_l"), F.col("lang_l")))
            .withColumn("tokens_r", tokenize_auto(F.col("text_r"), F.col("lang_r")))
            .withColumn("emb_l", emb(F.col("tokens_l")))
            .withColumn("emb_r", emb(F.col("tokens_r")))
        )
        feats = pair_features(sides)
        self.cfg.matcher.fit_pairs(feats)
        if self.cfg.use_cascade:
            self.cfg.cascade.fit_pairs(feats)
        return self.cfg.matcher
