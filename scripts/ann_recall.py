"""ANN recall evidence: lsh_topk recall@k vs brute force on a >=100k
vector corpus across (bands, rows, probe_bits) settings. Prints a
markdown table (pasted into BENCH.md) so the ANN "scale path" carries
measured recall, not just plumbing.

Corpus: deterministic random unit vectors plus planted moderate-cosine
neighbors for half the queries (the regime LSH must not miss); queries
are corpus members. Brute force is the exact baseline.

Usage: python scripts/ann_recall.py [n_vectors] [n_queries] [k]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from ember_spark.operators.ann import brute_force_topk, lsh_topk  # noqa: E402
from ember_spark.session import get_spark  # noqa: E402

DIM = 64
CONFIGS = [  # (bands, rows, probe_bits)
    (8, 3, 0),
    (8, 3, 1),
    (16, 3, 1),
    (16, 4, 1),
    (8, 4, 2),
]


def make_corpus(n: int, n_queries: int) -> pd.DataFrame:
    rng = np.random.default_rng(142)
    v = rng.normal(size=(n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # plant a cos~[0.6,0.9] neighbor for every even query id
    for q in range(0, n_queries, 2):
        c = 0.6 + 0.3 * rng.random()
        u = rng.normal(size=DIM)
        u -= (u @ v[q]) * v[q]
        u /= np.linalg.norm(u)
        v[n - 1 - q] = c * v[q] + np.sqrt(1 - c * c) * u
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [r.astype(np.float32).tolist() for r in v]}
    )


def make_clustered_corpus(n: int, n_clusters: int = 1000, sigma: float = 0.06) -> pd.DataFrame:
    """Planted Gaussian clusters on the sphere — IVF's operating regime
    (real text-embedding corpora are strongly clustered): `n_clusters`
    unit centers, each point = normalize(center + sigma*noise), so true
    neighbors share a cluster and a coarse quantizer's Voronoi cells
    align with the data. sigma sizes the TOTAL noise power sigma^2*DIM
    against the unit center: 0.06 -> 0.23, i.e. intra-cluster cosine
    ~0.9 while random centers sit at ~0 +- 1/sqrt(DIM) — separated
    clusters, the regime the claim is about."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    v = centers[assign] + sigma * rng.normal(size=(n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [r.astype(np.float32).tolist() for r in v],
        }
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("ann_recall", shuffle_partitions=32)
    corpus = spark.createDataFrame(make_corpus(n, n_q), "vec_id long, embedding array<float>")
    corpus = corpus.persist()
    corpus.count()
    queries = corpus.filter(f"vec_id < {n_q}")

    t0 = time.time()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, k=k).collect()
    }
    brute_sec = time.time() - t0

    lines = [
        "## ANN LSH recall vs brute force",
        "",
        f"corpus={n} dim={DIM} queries={n_q} k={k} "
        f"(planted cos 0.6-0.9 neighbors for half the queries); "
        f"brute-force baseline {brute_sec:.1f}s",
        "",
        "| bands | rows | probe_bits | recall@k | wall (s) |",
        "|---|---|---|---|---|",
    ]
    for bands, rows, probe in CONFIGS:
        t0 = time.time()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(
                corpus, queries, k=k, bands=bands, rows=rows, probe_bits=probe
            ).collect()
        }
        wall = time.time() - t0
        recall = len(got & truth) / len(truth)
        lines.append(f"| {bands} | {rows} | {probe} | {recall:.3f} | {wall:.1f} |")
    # IVF: one quantizer trained once, probed at increasing depth
    from ember_spark.operators.ann import ivf_topk, train_centroids

    t0 = time.time()
    cents = train_centroids(corpus, n_centroids=256, sample_size=50_000)
    train_sec = time.time() - t0
    lines += [
        "",
        f"IVF (256 inverted lists, quantizer trained once in"
        f" {train_sec:.1f}s on a 50k hash-sample; probe depth sweeps"
        f" recall against the same exact truth):",
        "",
        "| n_probe | fraction of corpus scanned | recall@k | wall (s) |",
        "|---|---|---|---|",
    ]
    for n_probe in (4, 16, 64):
        t0 = time.time()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                corpus, queries, k=k, centroids=cents, n_probe=n_probe
            ).collect()
        }
        wall = time.time() - t0
        recall = len(got & truth) / len(truth)
        lines.append(
            f"| {n_probe} | ~{n_probe / 256:.3f} | {recall:.3f} | {wall:.1f} |"
        )
    lines.append("")
    lines.append(
        "IVF's recall here is a WORST-CASE reading, deliberately: this"
        " synthetic corpus is uniform-random on the sphere, so it has"
        " no cluster structure for a coarse quantizer to exploit and"
        " true neighbors scatter across Voronoi cells — recall tracks"
        " little better than the scanned fraction. Real text-embedding"
        " corpora are strongly clustered (IVF's operating regime) —"
        " measured next on planted Gaussian clusters;"
        " data-independent banded LSH (above) is the right choice when"
        " the distribution is unknown, and its recall is what the"
        " dedup/ANN defaults rely on. Exhaustive probe (n_probe ="
        " n_centroids) is exact and oracle-checked in the driver"
        " contract (`ann_ivf_topk`)."
    )

    # ---- IVF in its operating regime: planted Gaussian clusters ----
    cl = spark.createDataFrame(
        make_clustered_corpus(n), "vec_id long, embedding array<float>"
    ).persist()
    cl.count()
    corpus.unpersist()
    cl_queries = cl.filter(f"vec_id < {n_q}")
    t0 = time.time()
    cl_truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(cl, cl_queries, k=k).collect()
    }
    cl_brute_sec = time.time() - t0
    t0 = time.time()
    cl_cents = train_centroids(cl, n_centroids=256, sample_size=50_000)
    cl_train_sec = time.time() - t0
    lines += [
        "",
        f"IVF on a CLUSTERED corpus (same n={n}, 1000 planted Gaussian"
        f" clusters on the sphere, sigma=0.06 => intra-cluster cosine"
        f" ~0.9 — the text-embedding regime IVF exists for; brute"
        f" baseline {cl_brute_sec:.1f}s,"
        f" 256-list quantizer trained in {cl_train_sec:.1f}s):",
        "",
        "| n_probe | fraction of corpus scanned | recall@k | wall (s) |",
        "|---|---|---|---|",
    ]
    for n_probe in (1, 4, 16):
        t0 = time.time()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                cl, cl_queries, k=k, centroids=cl_cents, n_probe=n_probe
            ).collect()
        }
        wall = time.time() - t0
        recall = len(got & cl_truth) / len(cl_truth)
        lines.append(
            f"| {n_probe} | ~{n_probe / 256:.3f} | {recall:.3f} | {wall:.1f} |"
        )
    lines.append("")
    lines.append(
        "On clustered data the quantizer's cells align with the"
        " clusters: a handful of probed lists recover nearly all true"
        " neighbors at a tiny scanned fraction — together with the"
        " uniform worst case above, these bracket IVF's behavior; pick"
        " IVF when the corpus is known-clustered, banded LSH otherwise."
    )
    lines.append("")
    lines.append(
        "Walls are NOT the headline at this shape: brute force is"
        f" O(|Q|*N) and |Q|={n_q} makes it trivially cheap, while LSH"
        " pays a fixed banding + bucket-shuffle cost. LSH's cost grows"
        " with corpus size and candidate fanout, brute force with"
        " |Q|*N — at the design point (|Q| ~ N, e.g. all-pairs dedup"
        " or full-corpus kNN) brute force is quadratic and banding is"
        " the only option; this table evidences the RECALL of that"
        " scale path against exact truth."
    )
    lines.append("")
    lines.append(
        "Reproduce: `python scripts/ann_recall.py [n_vectors] [n_queries] [k]`"
    )
    print("\n".join(lines))
    from bench_md import update_section

    update_section("ann_recall", "\n".join(lines))
    print("updated BENCH.md [ann_recall] section")


if __name__ == "__main__":
    main()
