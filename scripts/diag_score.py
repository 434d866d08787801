"""Diagnose the 4-slot er_score anomaly (round-5 scaling sweep: score
wall ~108s at BOTH 2 and 4 slots, ~37s at 8; CPU 256 -> 421-614 -> 320
core-s for identical work — non-monotonic, reproducible across trials).

Two subcommands:

  prep   — one 32-core JVM: generate the 400k bench corpus (seed 142,
           the scaling sweep's exact input), run prepare + block, and
           write `prepared` and `pairs` to parquet under --dir. Run
           once; every score experiment then starts from identical
           bytes.

  score  — fresh JVM at $SPARK_GRAFT_CPUS slots (the sweep's env
           contract, including EMBER_APC / EMBER_EXTRA_CONF): read the
           parquet, run ERPipeline.score + persist + count, print ONE
           JSON line {slots, wall, cpu, rows}. CPU is sampled by
           bench.py's TreeCpuSampler strictly inside the timed window.

Usage:
  python scripts/diag_score.py prep  --dir /dev/shm/er400k [--entities 400000]
  SPARK_GRAFT_CPUS=4 EMBER_APC=4 python scripts/diag_score.py score --dir /dev/shm/er400k
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prep", "score"])
    ap.add_argument("--dir", default="/dev/shm/er400k")
    ap.add_argument("--entities", type=int, default=400_000)
    args = ap.parse_args()

    from ember_spark.plans.pipeline import ERPipeline
    from ember_spark.session import get_spark

    bench_conf = {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    }

    if args.cmd == "prep":
        from ember_spark.fixtures import generate_pages, split_labels

        spark = get_spark("diag_prep", cores=32, shuffle_partitions=32,
                          extra_conf=bench_conf)
        pages_all = generate_pages(spark, args.entities, seed=142)
        pages, _ = split_labels(pages_all)
        docs = pages.select("url", "text", "lang").persist()
        docs.count()
        pipe = ERPipeline(spark)
        prepared = pipe.prepare(docs).persist()
        prepared.count()
        pairs = pipe.block(prepared)
        prepared.write.mode("overwrite").parquet(f"{args.dir}/prepared")
        pairs.write.mode("overwrite").parquet(f"{args.dir}/pairs")
        n_prep = spark.read.parquet(f"{args.dir}/prepared").count()
        n_pairs = spark.read.parquet(f"{args.dir}/pairs").count()
        print(json.dumps({"prepared": n_prep, "pairs": n_pairs}))
        return

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    n = int(cpus) if cpus else (os.cpu_count() or 8)
    spark = get_spark("diag_score", cores=n, shuffle_partitions=n,
                      extra_conf=bench_conf)
    import bench as bench_mod

    prepared = spark.read.parquet(f"{args.dir}/prepared").persist()
    prepared.count()
    pairs = spark.read.parquet(f"{args.dir}/pairs").persist()
    pairs.count()
    pipe = ERPipeline(spark)

    cpu = bench_mod.TreeCpuSampler().start()
    t0 = time.time()
    scored = pipe.score(pairs, prepared).persist()
    rows = scored.count()
    wall = time.time() - t0
    cpu_s = cpu.stop()
    print(json.dumps({
        "slots": n,
        "wall": round(wall, 2),
        "cpu": round(cpu_s, 1),
        "rows": rows,
        "conf": os.environ.get("EMBER_EXTRA_CONF", ""),
        "apc": os.environ.get("EMBER_APC", ""),
    }))


if __name__ == "__main__":
    main()
