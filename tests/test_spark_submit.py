"""The north_rule's literal launch contract: `spark-submit --py-files
ember_spark.zip scripts/run_pipeline.py ...` (BASELINE.json north_star;
reference runs its stages as plain python scripts — run.py / cli.py —
this is the Spark-native equivalent the rule names).

The existing CLI e2e (test_cli_e2e.py) drives run_pipeline.main()
in-process, which proves the dataflow but not the DISTRIBUTION story.
This test proves it: it zips the package, strips the repo from every
python-path channel (cwd moved to a tmp dir, PYTHONPATH scrubbed,
script copied out of the repo so its repo-root sys.path.insert points
at the tmp dir), and launches the REAL spark-submit binary as a
subprocess — the `--py-files` zip is then the ONLY way the driver and
the python UDF workers can import ember_spark, exactly the channel a
multi-executor cluster uses. A package that silently depended on
repo-relative file access or an unpicklable module-global would pass
in-process and fail here.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    p = shutil.which("spark-submit")
    if p:
        return p
    try:
        import pyspark
    except ImportError:  # pragma: no cover
        return None
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit binary")
def test_spark_submit_py_files_e2e(spark, tmp_path):
    from ember_spark.fixtures import generate_pages, split_labels

    pages, _labels = split_labels(generate_pages(spark, 40, seed=7))
    pages_path = str(tmp_path / "pages")
    pages.write.parquet(pages_path)
    n_pages = pages.count()

    # package zip exactly as a submitter would build it: the package
    # dir at the archive root, pure .py only
    zip_path = tmp_path / "ember_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "ember_spark")):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    # the script leaves the repo too: its defensive repo-root
    # sys.path.insert then points at tmp_path, which holds no package
    script = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    env["EMBER_DRIVER_MEM"] = "4g"  # builder value is inert post-launch; hygiene
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_path = tmp_path / "entities"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", str(zip_path),
            str(script),
            "--pages", pages_path,
            "--out", str(out_path),
            "--checkpoint", str(tmp_path / "ckpt"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-3000:])
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-1500:]
    assert json.loads(lines[-1])["entities_rows"] == n_pages

    # every page got an entity id, written where asked
    ents = spark.read.parquet(str(out_path))
    assert ents.count() == n_pages
    assert set(ents.columns) == {"url", "entity_id"}
