"""Round-3 additions: streaming/batch parity at a few hundred pages,
the bucketed payload mode wired through ERPipeline, the census-derived
hot-token guard in similar_clusters, and CC checkpoint hygiene
(input_fp override + post-convergence cleanup)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ember_spark.fixtures import generate_pages
from ember_spark.functions.hashing import lsh_band_keys
from ember_spark.operators.benchmark import similar_clusters
from ember_spark.operators.clustering import connected_components
from ember_spark.operators.scoring import make_pair_text_features_udf
from ember_spark.plans.pipeline import ERPipeline, PipelineConfig
from ember_spark.streaming.incremental_er import band_corpus, streaming_entity_assign


# ------------------------------------------------------- streaming parity
@pytest.fixture(scope="module")
def resolved_corpus(spark):
    pages = generate_pages(spark, 120, seed=142).cache()
    pipe = ERPipeline(spark)
    out = pipe.run(pages)
    prepared = out["prepared"].cache()
    entities = out["entities"].cache()
    prepared.count(), entities.count()
    return pipe, pages, prepared, entities


def _mixed_stream_rows(pages, n_copies=150, n_perturbed=100, n_novel=50):
    """A few hundred mixed pages: exact copies of corpus pages (must be
    assigned to their source's entity), perturbed copies, and novel
    gibberish (no guaranteed assignment either way — the point is
    stream == batch, not any specific answer)."""
    src = pages.select("warc_ts", "url", "text", "lang").collect()
    rows = []
    for i in range(n_copies):
        r = src[i % len(src)]
        rows.append((r["warc_ts"], f"copy://{i}", r["text"], r["lang"]))
    for i in range(n_perturbed):
        r = src[(i * 7) % len(src)]
        rows.append(
            (r["warc_ts"], f"pert://{i}", r["text"] + f" extratok{i}", r["lang"])
        )
    for i in range(n_novel):
        rows.append(
            (src[0]["warc_ts"], f"novel://{i}", f"zz{i}q xx{i}w vv{i}e uu{i}r", "en")
        )
    return rows


def test_stream_batch_parity_mixed_pages(spark, resolved_corpus, tmp_path):
    """Property run (VERDICT r2 #7): the stream's assignment for a batch
    of ~300 mixed pages must equal a BATCH dataflow scoring the same
    pages against the same banded corpus — same pairs, same scores."""
    pipe, pages, prepared, entities = resolved_corpus
    cfg = pipe.cfg
    banded = band_corpus(prepared, entities, bands=cfg.bands, rows=cfg.rows).cache()
    banded.count()
    hot = pipe.hot_token_list(pipe.extract(pages))
    rows = _mixed_stream_rows(pages)
    schema = "warc_ts timestamp, url string, text string, lang string"
    src_dir = str(tmp_path / "parity_src")
    spark.createDataFrame(rows, schema).write.parquet(src_dir)

    # ---- stream side
    stream = spark.readStream.schema(schema).parquet(src_dir)
    assigned = streaming_entity_assign(
        stream, banded, cfg.matcher,
        embedding_dim=cfg.embedding_dim, num_hashes=cfg.num_hashes,
        bands=cfg.bands, rows=cfg.rows, hot_tokens=hot,
    )
    q = (
        assigned.writeStream.format("memory")
        .queryName("parity_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["url"]: (r["entity_id"], r["best_score"])
            for r in spark.table("parity_stream").collect()
        }
    finally:
        q.stop()

    # ---- batch mirror: same banded corpus, batch ops end to end
    batch_pages = spark.createDataFrame(rows, schema)
    prep = pipe.prepare(pipe.extract(batch_pages))
    s = prep.select(
        "url",
        F.substring("text", 1, 80).alias("s_text"),
        F.length("text").cast("double").alias("s_len"),
        F.col("th").alias("s_th"),
        F.explode(lsh_band_keys(F.col("sig"), cfg.bands, cfg.rows)).alias("band_key"),
    )
    cand = (
        s.join(banded, "band_key")
        .dropDuplicates(["url", "c_rid"])
    )
    feats_udf = make_pair_text_features_udf(emb_dim=cfg.embedding_dim)
    mx, mn = F.greatest("s_len", "c_len"), F.least("s_len", "c_len")
    scored = (
        cand.withColumn(
            "_f", feats_udf(F.col("s_text"), F.col("c_text"), F.col("s_th"), F.col("c_th"))
        )
        .select(
            "url", "entity_id",
            F.col("_f.f_jaccard").alias("f_jaccard"),
            F.col("_f.f_containment").alias("f_containment"),
            F.col("_f.f_jw").alias("f_jw"),
            F.col("_f.f_cos").alias("f_cos"),
            F.when(mx == 0, F.lit(1.0)).otherwise(mn / mx).alias("f_len_ratio"),
        )
        .withColumn("score", cfg.matcher.score_col())
    )
    best = (
        scored.groupBy("url")
        .agg(F.max("score").alias("best_score"))
        .collect()
    )
    want_score = {r["url"]: r["best_score"] for r in best}
    # entities achieving the max score (ties legal either way)
    bests = spark.createDataFrame(best)
    argmax = (
        scored.join(bests, "url")
        .filter(F.abs(F.col("score") - F.col("best_score")) < 1e-12)
        .groupBy("url")
        .agg(F.collect_set("entity_id").alias("ents"))
        .collect()
    )
    want_ents = {r["url"]: set(r["ents"]) for r in argmax}

    assert len(got) == len(rows)
    thr = cfg.matcher.threshold
    for url, (eid, score) in got.items():
        if url in want_score:
            assert score == pytest.approx(want_score[url], abs=1e-9), url
            if score is not None and score >= thr:
                assert eid in want_ents[url], (url, eid, want_ents[url])
            else:
                assert eid is None, (url, eid, score)
        else:
            # no band collision at all in the batch mirror -> the stream
            # must also have found none
            assert eid is None and score is None, (url, eid, score)
    # exact copies must land on their source's entity (scores tie at max)
    ent_of = {r["url"]: r["entity_id"] for r in entities.collect()}
    src = pages.select("url").collect()
    for i in range(150):
        eid, score = got[f"copy://{i}"]
        assert eid == ent_of[src[i % len(src)]["url"]], (i, eid)


# ------------------------------------------------- bucketed pipeline mode
def test_pipeline_bucketed_payload_mode(spark, tmp_path):
    """payload_mode='bucketed' must produce the exact same scored pairs
    and entities as the default shuffle mode (VERDICT r2 #8)."""
    pages = generate_pages(spark, 60, seed=7).cache()
    base = ERPipeline(spark)
    buck = ERPipeline(
        spark,
        PipelineConfig(
            payload_mode="bucketed",
            payload_buckets=4,
            payload_table_location=str(tmp_path / "bkt"),
        ),
    )
    out_a = base.run(pages)
    out_b = buck.run(pages)
    a = sorted(map(tuple, out_a["scored"].select("id_l", "id_r", "score", "prediction").collect()))
    b = sorted(map(tuple, out_b["scored"].select("id_l", "id_r", "score", "prediction").collect()))
    assert a == b
    ea = sorted(map(tuple, out_a["entities"].collect()))
    eb = sorted(map(tuple, out_b["entities"].collect()))
    assert ea == eb
    # the bucketed payload tables must not leak into the warehouse: the
    # prefix is recorded and cleanup drops both tables
    assert buck._bucketed_prefixes, "score() should record the table prefix"
    buck.cleanup_bucketed_tables()
    assert not buck._bucketed_prefixes
    leftover = [
        t.name for t in spark.catalog.listTables() if t.name.startswith("ember_bucketed_")
    ]
    assert leftover == [], leftover

    # with a manifest the score stage is checkpointed to parquet, so
    # run() auto-drops the bucketed tables — and the outputs still read
    from ember_spark.plans.manifest import StageManifest

    mf = StageManifest(spark, str(tmp_path / "ckpt"))
    buck_mf = ERPipeline(
        spark,
        PipelineConfig(
            payload_mode="bucketed",
            payload_buckets=4,
            payload_table_location=str(tmp_path / "bkt2"),
        ),
        manifest=mf,
    )
    out_c = buck_mf.run(pages)
    assert not buck_mf._bucketed_prefixes  # auto-cleaned after checkpoint
    assert [
        t.name for t in spark.catalog.listTables() if t.name.startswith("ember_bucketed_")
    ] == []
    c = sorted(map(tuple, out_c["scored"].select("id_l", "id_r", "score", "prediction").collect()))
    assert c == a


# ------------------------------------------- similar_clusters auto guard
def test_similar_clusters_auto_guard_drops_ubiquitous_token(spark):
    """120 clusters all sharing one stopword-like token: with the
    census-derived default the hot token is dropped from the inverted
    index (sub-quadratic), so clusters related ONLY through it get no
    similarity row; clusters sharing real tokens still match."""
    n = 120
    rows = []
    for c in range(n):
        # every cluster: hot token 'common' + its own tokens; clusters
        # 0/1 additionally share two real tokens
        profile = sorted({"common", f"tok{c}a", f"tok{c}b"} | (
            {"shared1", "shared2"} if c in (0, 1) else set()
        ))
        rows.append((c, profile, len(profile)))
    profiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cluster_id", "profile", "profile_size"])
    )
    sim = similar_clusters(profiles, top_n=5).collect()  # max_token_df="auto"
    pairs = {(r["cluster_id"], r["sim_cluster"]) for r in sim}
    # auto cap = max(100, ceil(5*sqrt(120))) = 100 < 120 -> 'common' dropped
    assert (0, 1) in pairs and (1, 0) in pairs
    assert all({a, b} == {0, 1} for a, b in pairs), pairs

    # an explicit None disables the guard: every cluster pairs with
    # something through 'common'
    sim_all = similar_clusters(profiles, top_n=5, max_token_df=None)
    assert sim_all.select("cluster_id").distinct().count() == n

    # small corpora (<= 100 clusters): auto is inactive, results
    # identical to the unguarded run
    small = profiles.filter(F.col("cluster_id") < 20)
    auto_rows = sorted(map(tuple, similar_clusters(small, top_n=5).collect()))
    none_rows = sorted(
        map(tuple, similar_clusters(small, top_n=5, max_token_df=None).collect())
    )
    assert auto_rows == none_rows


# ------------------------------------------------- multimodal M5/M6 fusion
def test_image_pair_fusion_and_gated_sum(spark):
    """M5 fusion features (cos / L2-diff / hadamard-mean) and the M6
    gated sum over image feature vectors — real math, no codec needed;
    verified against numpy on the driver."""
    from ember_spark.operators.multimodal import (
        extract_image_features,
        gated_sum_udf,
        image_pair_features,
    )

    rows = [(i, bytes([i] * 8)) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, content binary")
    feats = extract_image_features(df, deterministic_fake=True, dim=16)
    pairs = (
        feats.alias("a")
        .join(feats.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_l"),
            F.col("b.id").alias("id_r"),
            F.col("a.img_features").alias("img_features_l"),
            F.col("b.img_features").alias("img_features_r"),
        )
    )
    got = image_pair_features(pairs).collect()
    assert len(got) == 15
    import numpy as np

    for r in got:
        a = np.array(r["img_features_l"], dtype=np.float64)
        b = np.array(r["img_features_r"], dtype=np.float64)
        assert r["img_cos"] == pytest.approx(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), abs=1e-6
        )
        assert r["img_diff_l2"] == pytest.approx(float(np.linalg.norm(a - b)), abs=1e-6)
        assert r["img_hadamard_mean"] == pytest.approx(float((a * b).mean()), abs=1e-6)

    gate = gated_sum_udf([0.0] * 32, bias=0.0)  # g = 0.5 -> midpoint
    fused = pairs.withColumn(
        "fused", gate(F.col("img_features_l"), F.col("img_features_r"))
    ).first()
    mid = 0.5 * np.array(fused["img_features_l"]) + 0.5 * np.array(
        fused["img_features_r"]
    )
    assert np.allclose(np.array(fused["fused"]), mid, atol=1e-6)


# -------------------------------------------- fingerprint completeness
def test_stage_fingerprints_cover_output_affecting_config(spark):
    """ADVICE r2: every output-affecting knob must change the stage
    fingerprints (else a manifest serves stale downstream checkpoints
    after a config change); perf-only knobs must NOT (so a perf retune
    can reuse checkpoints)."""
    base = ERPipeline(spark, PipelineConfig()).stage_fingerprints(input_fp="x")
    changing = [
        PipelineConfig(use_url_key=False),
        PipelineConfig(hot_token_df_frac=0.11),
        PipelineConfig(hot_token_max=999),
        PipelineConfig(feature_mode="cascade"),
        PipelineConfig(use_cascade=False),
        PipelineConfig(num_hashes=32),
        PipelineConfig(block_cap=77),
    ]
    for cfg in changing:
        fps = ERPipeline(spark, cfg).stage_fingerprints(input_fp="x")
        assert fps != base, cfg
    perf_only = [
        PipelineConfig(salt=4),
        PipelineConfig(score_partitions=3),
        PipelineConfig(broadcast_payload=True),
        PipelineConfig(payload_mode="bucketed"),
    ]
    for cfg in perf_only:
        fps = ERPipeline(spark, cfg).stage_fingerprints(input_fp="x")
        assert fps == base, cfg


# ------------------------------------- flagship-oracle assumption guard
def test_er_pipeline_oracle_assumptions_sf0001(spark):
    """The er_pipeline_entities oracle rests on two corpus facts (see
    the query docstring): candidate recall is exactly 1 (the shared
    url-path key blocks every pair at driver scale), and no pair's
    token jaccard sits within 1e-4 of the pinned 0.8565 boundary.
    Guard both at sf0.001 so a testdata regeneration that breaks either
    fails HERE, not in the driver's correctness gate."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata not present")
    from ember_spark.plans.pipeline import ERPipeline

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    pipe = ERPipeline(spark)
    # slim=False: this test reads raw tokens back for its brute-force
    # jaccard verification (the pipeline itself runs slim in arrow mode)
    prepared = pipe.prepare(docs, slim=False).persist()
    n = prepared.count()
    pairs = pipe.block(prepared)
    assert pairs.count() == n * (n - 1) // 2  # recall exactly 1
    toks = prepared.select("rid", F.array_distinct("tokens").alias("tk"))
    min_margin = (
        pairs.join(
            toks.select(F.col("rid").alias("id_l"), F.col("tk").alias("tl")), "id_l"
        )
        .join(toks.select(F.col("rid").alias("id_r"), F.col("tk").alias("tr")), "id_r")
        .withColumn("inter", F.size(F.array_intersect("tl", "tr")))
        .withColumn("uni", F.size(F.array_union("tl", "tr")))
        .withColumn(
            "jac",
            F.when(F.col("uni") == 0, 1.0).otherwise(F.col("inter") / F.col("uni")),
        )
        .agg(F.min(F.abs(F.col("jac") - 0.8565)))
        .first()[0]
    )
    assert min_margin > 1e-4, min_margin
    prepared.unpersist()


# --------------------------------------------------- CC checkpoint hygiene
def test_cc_input_fp_and_cleanup(spark, tmp_path):
    edges = spark.createDataFrame(
        pd.DataFrame({"id_l": [1, 2, 5, 7, 8], "id_r": [2, 3, 6, 8, 9]}),
        "id_l long, id_r long",
    )
    root = tmp_path / "cc"
    out = connected_components(
        edges, checkpoint_dir=str(root), input_fp="contentv1"
    )
    got = sorted(map(tuple, out.collect()))
    assert got == sorted(
        map(tuple, connected_components(edges).collect())
    )
    # explicit input_fp names the subdirectory
    assert os.listdir(root) == ["contentv1"]
    # post-convergence cleanup keeps ONLY the final iteration dir
    iters = sorted(
        d for d in os.listdir(root / "contentv1") if d.startswith("cc_iter_")
    )
    assert len(iters) == 1, iters
    # the returned DataFrame still reads fine after cleanup
    assert out.count() == len(got)
