"""Pure-python pair-feature kernel scaling, no Spark (evidence cited in
BENCH.md): runs the scoring stage's per-batch python work — hashed-token
intersect (np.intersect1d) + Jaro-Winkler — in K forked worker
processes pinned by the caller, K vs 4K, same total batches.

On a real cluster each executor brings its own python workers, so this
is the component that multiplies with executor count; measuring it as
plain OS processes strips Spark's single-box shuffle sharing out of the
picture and bounds what the dataflow itself can scale to.

Usage:
    taskset -c 0-1 python scripts/kernel_scaling.py 2
    taskset -c 0-7 python scripts/kernel_scaling.py 8
(compare total wall; efficiency = wall_K / (4 * wall_4K)... inverted:
 (wall_K / wall_4K) / 4)
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ember_spark.functions.hashing import emb_from_th  # noqa: E402
from ember_spark.functions.similarity import jaro_winkler_batch  # noqa: E402

N_BATCHES = 32
BATCH = 10_000


def _make_batch():
    rng = np.random.default_rng(142)
    texts = ["".join(rng.choice(list("abcdefgh "), size=80)) for _ in range(BATCH)]
    th = [np.unique(rng.integers(0, 1 << 31, size=90).astype(np.int32)) for _ in range(BATCH)]
    return pd.Series(texts), pd.Series(th, dtype=object)


TEXT, TH = _make_batch()
TEXT_L = TEXT.tolist()
TEXT_R = TEXT_L[1:] + TEXT_L[:1]


def work(n_batches: int) -> float:
    t0 = time.time()
    for _ in range(n_batches):
        n = BATCH
        jac = np.zeros(n)
        cont = np.zeros(n)
        # mirrors make_pair_text_features_udf exactly: JW is the
        # chunked batch-vectorized kernel (r3-final), jac/cont/cos the
        # per-pair loop
        jw = jaro_winkler_batch(TEXT_L, TEXT_R, max_len=80)
        for i in range(n):
            a = TH.iloc[i]
            b = TH.iloc[(i + 1) % n]
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            jac[i] = inter / union if union else 0.0
            cont[i] = inter / min(a.size, b.size)
            # f_cos recomputed from th (emb_from_th) instead of
            # shipping embeddings
            float(
                np.dot(
                    emb_from_th(a, 64).astype(np.float64),
                    emb_from_th(b, 64).astype(np.float64),
                )
            )
    return time.time() - t0


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    per = N_BATCHES // k
    t0 = time.time()
    with mp.Pool(k) as p:
        walls = p.map(work, [per] * k)
    total = time.time() - t0
    print(
        f"workers={k} batches={per * k} total_wall={total:.1f}s "
        f"worker_walls={[round(w, 1) for w in walls]} "
        f"pairs_per_sec={per * k * BATCH / total:.0f}"
    )


if __name__ == "__main__":
    main()
