"""Bucketed vs shuffle payload-attach comparison (VERDICT r1 item 8).

Times attach_pair_payload (two sort-merge exchanges of the pair table
per run) against attach_pair_payload_bucketed (one-time bucketed write,
then exchange-free joins) on the synthetic ER corpus. Reports both the
write cost and the per-join cost. On this tmpfs-shuffle box the shuffle
join stays cheaper (and is the pipeline default); the bucketed plan's
value is shape, not local wall — zero Exchange per re-join of the pair
table, which on a network cluster at 10^12 pairs is the whole game.

Usage: python scripts/bucketed_bench.py [entities]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ember_spark.fixtures import generate_pages, split_labels  # noqa: E402
from ember_spark.operators.blocking import (  # noqa: E402
    attach_pair_payload,
    attach_pair_payload_bucketed,
)
from ember_spark.plans.pipeline import ERPipeline  # noqa: E402
from ember_spark.session import get_spark  # noqa: E402


def main() -> None:
    entities = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("bucketed_bench", shuffle_partitions=32)
    pages, _ = split_labels(generate_pages(spark, entities, seed=142))
    docs = pages.select("url", "text", "lang").persist()
    docs.count()
    pipe = ERPipeline(spark)
    prepared = pipe.prepare(docs, slim=False).persist()
    prepared.count()
    pairs = pipe.block(prepared).persist()
    n_pairs = pairs.count()
    # pairs carry whatever id the pipeline blocks on (rid when present)
    idc = "rid" if "rid" in prepared.columns else "url"
    slim = prepared.select(
        idc, F.substring("text", 1, 80).alias("text"), "tokens", "emb"
    )
    payload = ["text", "tokens", "emb"]

    t0 = time.time()
    n1 = attach_pair_payload(
        pairs, slim, idc, payload, broadcast_payload=False
    ).count()
    shuffle_sec = time.time() - t0

    loc = tempfile.mkdtemp(prefix="ember_bkt_")
    try:
        t0 = time.time()
        bucketed = attach_pair_payload_bucketed(
            pairs, slim, idc, payload, buckets=32,
            table_prefix="bb_bench", location=loc,
        )
        n2 = bucketed.count()  # includes the one-time bucketed writes
        bucketed_first_sec = time.time() - t0
        t0 = time.time()
        n3 = spark.table("bb_bench_pairs").join(
            spark.table("bb_bench_corpus").select(
                F.col(idc).alias("id_l"),
                *[F.col(c).alias(f"{c}_l") for c in payload],
            ),
            "id_l",
        ).join(
            spark.table("bb_bench_corpus").select(
                F.col(idc).alias("id_r"),
                *[F.col(c).alias(f"{c}_r") for c in payload],
            ),
            "id_r",
        ).count()  # steady-state: tables already bucketed
        bucketed_steady_sec = time.time() - t0
    finally:
        shutil.rmtree(loc, ignore_errors=True)

    assert n1 == n2 == n3 == n_pairs, (n1, n2, n3, n_pairs)
    md = "\n".join(
        [
            "## Bucketed vs shuffle payload attach",
            "",
            "One-time bucketed+sorted write of corpus and pair table, then"
            " exchange-free bucket-to-bucket joins, vs re-exchanging the"
            " pair table through two sort-merge joins on every run.",
            "",
            "What these numbers do and do not show: on THIS box shuffles"
            " travel through tmpfs, so the exchange the bucketed plan"
            " eliminates costs almost nothing and the bucketed table-scan"
            " overhead dominates — the shuffle join is the right local"
            " default (and the pipeline's default). The bucketed path is"
            " the NETWORK-cluster scale play: its value is the plan shape"
            " — zero Exchange on the pair table per join, machine-asserted"
            " in tests/test_scale_paths.py — where each re-join of a 10^12-row"
            " pair table otherwise re-shuffles it across the wire"
            " (rescoring, feature iteration, multi-model sweeps).",
            "",
            "| input | shuffle join | bucketed write+join | bucketed steady-state join |",
            "|---|---|---|---|",
            f"| {entities} entities / {n_pairs} pairs "
            f"| {shuffle_sec:.1f}s "
            f"| {bucketed_first_sec:.1f}s "
            f"| {bucketed_steady_sec:.1f}s |",
            "",
            "Reproduce: `python scripts/bucketed_bench.py [entities]`",
        ]
    )
    print(md)
    sys.path.insert(0, "/root/repo/scripts")
    from bench_md import update_section

    update_section("bucketed", md)
    print("updated BENCH.md [bucketed] section")


if __name__ == "__main__":
    main()
