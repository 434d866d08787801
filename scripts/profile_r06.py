"""Round-6 stage dissection: time each component of er_prepare /
er_block / er_score separately (noop sink per guide §1.4, labeled jobs
per §1.5) so the optimization targets are measured, not guessed.

Usage: python scripts/profile_r06.py [entities]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ember_spark.fixtures import generate_pages, split_labels  # noqa: E402
from ember_spark.plans.pipeline import ERPipeline  # noqa: E402
from ember_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main(entities: int = 30000) -> None:
    n = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "profile_r06", cores=n, shuffle_partitions=n,
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
        },
    )
    sc = spark.sparkContext

    pages_all = generate_pages(spark, entities, seed=142)
    pages, _ = split_labels(pages_all)
    docs = pages.select("url", "text", "lang").persist()
    t0 = time.time()
    n_docs = docs.count()
    print(f"generate+persist: {time.time()-t0:.2f}s  docs={n_docs}")

    pipe = ERPipeline(spark)

    # ---------------- er_prepare dissection
    from ember_spark.functions.tokenize import tokenize_auto

    sc.setJobDescription("prepare: tokenize only (noop)")
    base = docs.select(
        "url", "text", "lang",
        tokenize_auto(F.col("text"), F.col("lang")).alias("tokens"),
    )
    t = noop(base.select("tokens"))
    print(f"prepare.tokenize_only noop: {t:.2f}s")

    sc.setJobDescription("prepare: hot-token census")
    t0 = time.time()
    hot = pipe._hot_tokens(base)
    print(f"prepare.census: {time.time()-t0:.2f}s  hot={len(hot)}")

    sc.setJobDescription("prepare: full prepare (noop)")
    t = noop(pipe.prepare(docs))
    print(f"prepare.full noop: {t:.2f}s")

    sc.setJobDescription("prepare: full prepare persist+count")
    prepared = pipe.prepare(docs).persist()
    t0 = time.time()
    prepared.count()
    print(f"prepare.persist_count: {time.time()-t0:.2f}s")

    # ---------------- er_block dissection
    sc.setJobDescription("block: full (noop)")
    t = noop(pipe.block(prepared))
    print(f"block.full noop: {t:.2f}s")

    pairs = pipe.block(prepared).persist()
    t0 = time.time()
    n_pairs = pairs.count()
    print(f"block.persist_count: {time.time()-t0:.2f}s  pairs={n_pairs}")

    # ---------------- er_score dissection
    sc.setJobDescription("score: payload attach only (noop)")
    # mimic score()'s slim projection + attach
    from ember_spark.operators.blocking import attach_pair_payload

    slim = prepared.select(
        "rid",
        F.substring("text", 1, 80).alias("text"),
        F.length("text").cast("double").alias("text_len"),
        F.col("th"),
    )
    withpay = attach_pair_payload(
        pairs, slim, "rid", ["text", "text_len", "th"], broadcast_payload=False
    )
    t = noop(withpay)
    print(f"score.attach_only noop: {t:.2f}s")

    sc.setJobDescription("score: full (noop)")
    t = noop(pipe.score(pairs, prepared))
    print(f"score.full noop: {t:.2f}s")

    sc.setJobDescription("score: full broadcast-payload (noop)")
    withpay_b = attach_pair_payload(
        pairs, slim, "rid", ["text", "text_len", "th"], broadcast_payload=True
    )
    t = noop(withpay_b)
    print(f"score.attach_broadcast noop: {t:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30000)
