"""spark-submit entry point for the ER pipeline.

    spark-submit --py-files ember_spark.zip scripts/run_pipeline.py \
        --pages /data/pages_parquet --out /data/entities \
        --checkpoint /data/ckpt [--labeled-pairs /data/pairs]

Reads the pages table (url, warc_ts, html, text, lang), runs
extract -> block -> score -> cluster with stage checkpointing (resume
idempotently from --checkpoint), optionally trains the matcher on an
ember-shaped labeled pair table first, and writes entities(url,
entity_id). On a cluster the SparkSession comes from spark-submit; in
local runs the builder configures local[N].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python scripts/run_pipeline.py` runs (no --py-files) need the
# repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet/table path")
    ap.add_argument("--out", required=True, help="output entities path")
    ap.add_argument("--checkpoint", default=None, help="stage-manifest root for resume")
    ap.add_argument("--labeled-pairs", default=None, help="labeled pairs parquet to fit the matcher")
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--block-cap", type=int, default=1000)
    args = ap.parse_args()

    from ember_spark.plans.manifest import StageManifest
    from ember_spark.plans.pipeline import ERPipeline, PipelineConfig
    from ember_spark.session import get_spark
    from ember_spark.sources.writers import write_parquet

    spark = get_spark("ember_er_pipeline")
    cfg = PipelineConfig(
        num_hashes=args.num_hashes,
        bands=args.bands,
        rows=args.rows,
        block_cap=args.block_cap,
    )
    manifest = StageManifest(spark, args.checkpoint) if args.checkpoint else None
    pipe = ERPipeline(spark, cfg, manifest=manifest)

    if args.labeled_pairs:
        pipe.fit_matcher(spark.read.parquet(args.labeled_pairs))
        print(json.dumps({"matcher": json.loads(cfg.matcher.to_json())}), file=sys.stderr)

    t0 = time.time()
    pages = spark.read.parquet(args.pages)
    out = pipe.run(pages)
    write_parquet(out["entities"], args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"entities_rows": n, "wall_sec": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
