"""End-to-end test of the spark-submit entry point
(scripts/run_pipeline.py): pages parquet in -> entities parquet out,
with matcher fitting and checkpointed resume. Runs in-process (the
SparkSession builder getOrCreate()s the test session)."""

import json
import sys

from ember_spark.fixtures import generate_labeled_pairs, generate_pages, split_labels


def _run_cli(argv: list[str], capsys) -> dict:
    sys.path.insert(0, "/root/repo/scripts")
    import run_pipeline

    old = sys.argv
    sys.argv = ["run_pipeline.py"] + argv
    try:
        run_pipeline.main()
    finally:
        sys.argv = old
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out_lines[-1])


def test_run_pipeline_cli_e2e(spark, tmp_path, capsys):
    pages, _ = split_labels(generate_pages(spark, 60, seed=21))
    pages_path = str(tmp_path / "pages")
    pages.write.parquet(pages_path)
    lp = generate_labeled_pairs(spark, 60, seed=21)
    lp_path = str(tmp_path / "pairs")
    lp.write.parquet(lp_path)
    out_path = str(tmp_path / "entities")
    ckpt = str(tmp_path / "ckpt")

    res = _run_cli(
        ["--pages", pages_path, "--out", out_path, "--checkpoint", ckpt,
         "--labeled-pairs", lp_path],
        capsys,
    )
    n_pages = pages.count()
    assert res["entities_rows"] == n_pages

    # resume: second run must serve all stages from the checkpoint and
    # produce identical output
    ents1 = sorted(map(tuple, spark.read.parquet(out_path).collect()))
    res2 = _run_cli(
        ["--pages", pages_path, "--out", out_path + "2", "--checkpoint", ckpt,
         "--labeled-pairs", lp_path],
        capsys,
    )
    assert res2["entities_rows"] == n_pages
    ents2 = sorted(map(tuple, spark.read.parquet(out_path + "2").collect()))
    assert ents1 == ents2
