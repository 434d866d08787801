"""Dump .explain('formatted') for every bench-timed query and the four
ER stage DataFrames into a directory (plans/r06 evidence).

Usage: python scripts/dump_plans_r06.py OUTDIR [SUFFIX]
Run from the repo whose plans you want (round-start worktree for
*_before.txt, HEAD for *_after.txt).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

SF = "/root/testdata/sf0.1"


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(outdir: str, suffix: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as entry_mod

    from ember_spark.fixtures import generate_pages, split_labels
    from ember_spark.plans.pipeline import ERPipeline
    from ember_spark.session import get_spark

    spark = get_spark("dump_plans", cores=32, shuffle_partitions=32)

    def dump(name: str, df) -> None:
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
            f.write(explain_str(df))
        print("wrote", name)

    for name in [
        "tpch_q1", "j1_join_agg", "q3_shipping", "t1_topk_per_group_asc",
        "x5_jaccard_pairs", "minhash_lsh_dedup", "ann_topk",
        "quality_score", "benchmark_pairs", "er_pipeline_entities",
    ]:
        dump(name, entry_mod.queries()[name](spark, SF))

    # ER stage plans exactly as bench.py wires them (30k entities)
    pages, _ = split_labels(generate_pages(spark, 30000, seed=142))
    docs = pages.select("url", "text", "lang").persist()
    docs.count()
    pipe = ERPipeline(spark)
    prepared = pipe.prepare(docs)
    dump("er_prepare", prepared)
    prepared = prepared.persist()
    prepared.count()
    pairs = pipe.block(prepared)
    dump("er_block", pairs)
    pairs = pairs.persist()
    pairs.count()
    scored = pipe.score(pairs, prepared)
    dump("er_score", scored)
    scored = scored.persist()
    scored.count()
    # er_cluster's local fast path has no single plan; dump the edge
    # projection feeding it
    dump("er_cluster_edges", scored.filter("prediction = 1").select("id_l", "id_r"))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "after")
