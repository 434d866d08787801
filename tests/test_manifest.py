"""Resume-idempotency (north_rule): rerunning a manifest-backed
pipeline serves finished stages from the checkpoint byte-identically,
and changed params invalidate the fingerprint."""

import pandas as pd

from ember_spark.plans.manifest import StageManifest


def _build_calls(spark, counter):
    def build():
        counter["n"] += 1
        return spark.createDataFrame(
            pd.DataFrame({"id": [1, 2, 3], "v": ["a", "b", "c"]}), "id long, v string"
        )

    return build


def test_stage_resume(spark, tmp_path):
    mf = StageManifest(spark, str(tmp_path / "ckpt"))
    counter = {"n": 0}
    df1 = mf.run_stage("s1", "fp1", _build_calls(spark, counter))
    rows1 = sorted((r["id"], r["v"]) for r in df1.collect())
    assert counter["n"] == 1

    # same fingerprint -> no recompute, identical rows
    df2 = mf.run_stage("s1", "fp1", _build_calls(spark, counter))
    assert counter["n"] == 1
    assert sorted((r["id"], r["v"]) for r in df2.collect()) == rows1

    # changed fingerprint (params/input changed) -> recompute
    mf.run_stage("s1", "fp2", _build_calls(spark, counter))
    assert counter["n"] == 2


def test_manifest_records_partition_lineage(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    mf = StageManifest(spark, root)
    counter = {"n": 0}
    mf.run_stage("sX", "fp", _build_calls(spark, counter))
    parts = spark.read.parquet(f"{root}/sX/_partitions")
    total = sum(r["rows"] for r in parts.collect())
    assert total == 3
    entries = mf._read_manifest()
    assert entries and entries[-1]["stage"] == "sX" and entries[-1]["rows"] == 3
