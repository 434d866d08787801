"""Imbalanced benchmark (reference's 1:99 `test_i` splits,
`data/ali/README.md:155-161`) and pipeline-level resume idempotency
(north_rule: kill after stage k, rerun, identical outputs)."""

import pytest
from pyspark.sql import functions as F

from ember_spark.evaluate import pairwise_prf
from ember_spark.fixtures import generate_labeled_pairs, generate_pages, split_labels
from ember_spark.plans.manifest import StageManifest
from ember_spark.plans.pipeline import ERPipeline
from tests.test_pipeline import _featurize


def test_matcher_on_imbalanced_pairs(spark):
    """Train at the reference's 1:3 ratio, evaluate at ~1:20 imbalance
    (driver-side generator; ~1:99 would need more entities than the
    test budget). Precision must hold up when negatives dominate."""
    pipe = ERPipeline(spark)
    train = generate_labeled_pairs(spark, 250, seed=142)
    matcher = pipe.fit_matcher(train)
    imb = generate_labeled_pairs(spark, 150, seed=123, neg_per_pos=20)
    n_pos = imb.filter("label = 1").count()
    n_neg = imb.filter("label = 0").count()
    assert n_neg > 10 * n_pos
    m = pairwise_prf(matcher.predict(_featurize(imb)))
    assert m["precision"] >= 0.97, m
    assert m["recall"] >= 0.97, m
    assert m["f1"] >= 0.97, m


def test_pipeline_resume_identical_output(spark, tmp_path):
    pages, _ = split_labels(generate_pages(spark, 120, seed=7))
    root = str(tmp_path / "ckpt")

    pipe1 = ERPipeline(spark, manifest=StageManifest(spark, root))
    out1 = pipe1.run(pages)
    ents1 = sorted((r["url"], r["entity_id"]) for r in out1["entities"].collect())

    # "killed after completion, rerun": same manifest root, all stages
    # must be served from the checkpoint and yield identical rows
    pipe2 = ERPipeline(spark, manifest=StageManifest(spark, root))
    out2 = pipe2.run(pages)
    ents2 = sorted((r["url"], r["entity_id"]) for r in out2["entities"].collect())
    assert ents1 == ents2

    # manifest must show exactly one record per stage (no recompute)
    entries = StageManifest(spark, root)._read_manifest()
    stages = [e["stage"] for e in entries]
    assert sorted(stages) == sorted(set(stages))


def test_pipeline_partial_resume(spark, tmp_path):
    """Simulate a crash after 'block': seed the checkpoint by running
    the first stages, then a fresh pipeline completes from there without
    recomputing them (manifest keeps one entry per completed stage)."""
    pages, _ = split_labels(generate_pages(spark, 80, seed=9))
    root = str(tmp_path / "ckpt2")

    m1 = StageManifest(spark, root)
    pipe1 = ERPipeline(spark, manifest=m1)
    fps = pipe1.stage_fingerprints(pages)
    docs = m1.run_stage("extract", fps["extract"], lambda: pipe1.extract(pages))
    prepared = m1.run_stage("prepare", fps["prepare"], lambda: pipe1.prepare(docs))
    m1.run_stage("block", fps["block"], lambda: pipe1.block(prepared))
    assert len(m1._read_manifest()) == 3

    pipe2 = ERPipeline(spark, manifest=StageManifest(spark, root))
    out = pipe2.run(pages)
    assert out["entities"].count() > 0
    entries = StageManifest(spark, root)._read_manifest()
    assert sorted(e["stage"] for e in entries) == sorted(
        ["extract", "prepare", "block", "score", "entities"]
    )


def test_pipeline_resume_invalidated_by_new_input(spark, tmp_path):
    """Same checkpoint root + same config but DIFFERENT input must not
    serve stale stage outputs (fingerprints chain from the input fp)."""
    pages1, _ = split_labels(generate_pages(spark, 40, seed=11))
    pages2, _ = split_labels(generate_pages(spark, 70, seed=12))
    root = str(tmp_path / "ckpt3")
    ERPipeline(spark, manifest=StageManifest(spark, root)).run(pages1, input_fp="in1")
    out = ERPipeline(spark, manifest=StageManifest(spark, root)).run(pages2, input_fp="in2")
    # every url of the NEW input is present — nothing stale was reused
    assert out["entities"].count() == pages2.count()
