"""Deterministic hashing primitives: MinHash signatures, LSH band keys,
SimHash, hashing-trick embeddings.

MinHash/banding are pure native expressions built on `xxhash64`
(seeded by position) — fully codegen'd, no Python, and deterministic
across runs/executors (SURVEY.md §7.1 step 4). SimHash is codegen too
since round 3 (`simhash64_df`: md5-derived token hashes + 64
map-side-combining vote aggregates — no Python stage, and
oracle-checkable because md5 is cross-engine). The hyperplane/hashing
embedding remains an Arrow-batched pandas UDF (documented slow path,
used by dedup ops only).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, IntegerType, LongType

_MAX_LONG = (1 << 63) - 1


def minhash_signature(tokens: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<long>, length num_hashes) of a token array.

    hash_i(t) = xxhash64(i, t); signature[i] = min over distinct tokens.
    Empty/null token arrays produce an all-MAX signature — callers must
    filter empty docs before banding (an all-MAX band would collide
    every empty doc into one hot block).
    """
    init = F.array(*[F.lit(_MAX_LONG).cast("long") for _ in range(num_hashes)])
    tok_hashes = lambda t: F.array(*[F.xxhash64(F.lit(i), t) for i in range(num_hashes)])  # noqa: E731
    sig = F.aggregate(
        F.array_distinct(F.coalesce(tokens, F.array())),
        init,
        lambda acc, t: F.zip_with(acc, tok_hashes(t), lambda a, b: F.least(a, b)),
    )
    return sig


def lsh_band_keys(sig: Column, bands: int, rows: int) -> Column:
    """Collapse a MinHash signature into `bands` band-hash keys
    (array<long>); band b hashes signature slots [b*rows, (b+1)*rows).
    Band identity is baked into the hash seed so different bands never
    collide with each other after `posexplode`.
    """
    keys = [
        F.xxhash64(F.lit(b), *[sig[b * rows + j] for j in range(rows)])
        for b in range(bands)
    ]
    return F.array(*keys)


def _stable_u64(token: str, seed: int) -> int:
    h = hashlib.blake2b(token.encode("utf-8"), digest_size=8, salt=struct.pack("<q", seed)).digest()
    return struct.unpack("<Q", h)[0]


def _md5_u64(token: str) -> int:
    """First 16 hex chars of md5 as an unsigned 64-bit int — the one
    64-bit token hash both Spark (`md5`+`conv`) and ANSI SQL engines
    (DuckDB `md5` + hex cast) compute identically, which is what makes
    SimHash oracle-checkable end-to-end."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16)


def simhash64_py(tokens: list[str] | None) -> int:
    """Pure-Python 64-bit SimHash of a token list (mirror of
    `simhash64_df`; the unit-test oracle)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in set(tokens):
        h = _md5_u64(t)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    # reinterpret as signed long for Spark LongType
    return int(np.int64(out))


@F.pandas_udf(LongType())
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """Arrow mirror of `simhash64_py` — kept as a test/debug aid; the
    dedup path uses the codegen `simhash64_df` (no Python stage)."""
    return pd.Series([simhash64_py(list(t) if t is not None else None) for t in tokens], dtype="int64")


def simhash64_df(df, id_col: str = "id", tokens_col: str = "toks"):
    """64-bit SimHash per row, entirely in whole-stage codegen — no
    Python worker anywhere (reference near-dup op; SURVEY.md §2 dedup).

    Per distinct token the 64-bit hash is md5-derived: `hi` = hex chars
    1-8 (bits 32-63), `lo` = chars 9-16 (bits 0-31) — both `conv`-parsed
    32-bit values that fit a BIGINT under ANSI mode, and bit-identical
    to what any SQL engine with `md5` computes (the SimHash oracle in
    `__spark_entry__.py` mirrors these expressions in DuckDB). The
    per-bit majority vote is one groupBy with 64 map-side-combining
    `sum` aggregates over the exploded distinct tokens — O(docs x
    tokens) rows into a partial agg, not a per-bit explode. Docs with
    no tokens get simhash 0 via the left join back to the id set.

    Returns (id_col, simhash long).
    """
    ids = df.select(F.col(id_col).alias("_sid")).distinct()
    tok = df.select(
        F.col(id_col).alias("_sid"),
        F.explode(F.array_distinct(F.coalesce(F.col(tokens_col), F.array()))).alias("_t"),
    )
    hexed = F.md5(F.col("_t"))
    tok = tok.select(
        "_sid",
        F.conv(F.substring(hexed, 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring(hexed, 9, 8), 16, 10).cast("long").alias("_lo"),
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("_lo" if b < 32 else "_hi"), b % 32)
                .bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(64)
    ]
    voted = tok.groupBy("_sid").agg(*votes)
    lo_out = sum(
        (F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")) for b in range(1, 32)),
        start=F.when(F.col("_v0") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    hi_out = sum(
        (F.when(F.col(f"_v{b}") > 0, F.lit(1 << (b - 32)).cast("long")).otherwise(F.lit(0).cast("long")) for b in range(33, 64)),
        start=F.when(F.col("_v32") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    sh = voted.select(
        "_sid", F.shiftleft(hi_out, 32).bitwiseOR(lo_out).alias("simhash")
    )
    return (
        ids.join(sh, "_sid", "left")
        .select(
            F.col("_sid").alias(id_col),
            F.coalesce(F.col("simhash"), F.lit(0).cast("long")).alias("simhash"),
        )
    )


def th_from_tokens(tokens: list[str] | None) -> np.ndarray:
    """The `th` payload: SORTED UNIQUE int32 token hashes (top 32 bits
    of the u64 minhash base hash) of a token list. A ~100-token doc
    pair has ~1e-6 odds of any cross-collision in 2^32 — irrelevant for
    similarity FEATURES — and the pair shuffle ships half the bytes of
    int64 hashes. unique runs AFTER the int32 cast so the array is
    genuinely sorted in int32 order (unique-then-cast would wrap >=2^31
    values negative and break the documented sortedness)."""
    if not tokens:
        return np.empty(0, dtype=np.int32)
    hs = np.fromiter(
        (_token_u64(t) for t in tokens), dtype=np.uint64, count=len(tokens)
    )
    return np.unique((hs >> np.uint64(32)).astype(np.int64).astype(np.int32))


def emb_from_th(th, dim: int = 64) -> np.ndarray:
    """Hashing-trick embedding as a PURE FUNCTION of the `th` hashed-
    token array: slot = h mod dim, sign from an independent hash bit,
    bincount-accumulated, L2-normalized, float32.

    Deriving the embedding from `th` (instead of hashing raw tokens
    separately) means any consumer already holding `th` — the scoring
    UDF, the streaming assigner — can recompute the embedding EXACTLY
    instead of shipping ~dim*4 bytes per record through the pair
    shuffle: at 10^12 pairs that is the difference between a ~1.1 KB
    and a ~0.85 KB pair payload on the widest shuffle of the job."""
    if th is None or len(th) == 0:
        return np.zeros(dim, dtype=np.float32)
    u = np.asarray(th, dtype=np.int64) & 0xFFFFFFFF  # reinterpret as u32
    v = np.bincount(
        (u % dim).astype(np.intp),
        weights=np.where((u >> 20) & 1 == 1, 1.0, -1.0),
        minlength=dim,
    )
    n = np.linalg.norm(v)
    if n > 0:
        v = v / n
    return v.astype(np.float32)


def hash_embedding_py(tokens: list[str] | None, dim: int = 64) -> list[float]:
    """Hashing-trick embedding of a token list = emb_from_th of its
    hashed UNIQUE token set; L2-normalized, deterministic (blake2b)
    across processes. The python mirror of `make_hash_embedding_udf`
    and of `prepare`'s emb output."""
    return [float(x) for x in emb_from_th(th_from_tokens(tokens), dim)]


def pair_cos_from_th_batch(tok_l, tok_r, dim: int = 64) -> np.ndarray:
    """f_cos for a whole Arrow batch of pairs in ONE numpy pass per
    side: cos_i = dot(emb_from_th(tok_l[i]), emb_from_th(tok_r[i])).

    The per-pair form (2 bincounts + 2 norms + astype + dot per pair)
    measured ~30 µs/pair — ~60% of the scoring kernel's CPU and, at
    wide parallelism, the allocator churn behind the prepare/score
    memory-bandwidth knee. Here each side's embeddings for ALL pairs
    come from a single `bincount(pair_idx*dim + slot)` scatter over the
    flattened token buffer, then one row-normalize and one row-wise
    dot (einsum).

    Value identity with the scalar path (property-tested exact in
    tests/test_round5.py): bincount accumulates each pair's slots in
    within-pair element order either way; the row norm and the final
    dot both reduce 64 float64 products with np.dot/BLAS semantics
    (norms via einsum on each row match np.linalg.norm's 1-D dot), and
    the float32 quantization is applied elementwise before the float64
    dot exactly as emb_from_th does.
    """
    n = len(tok_l)

    def side_matrix(tok) -> np.ndarray:
        lens = np.fromiter(
            (0 if t is None else len(t) for t in tok), dtype=np.intp, count=n
        )
        total = int(lens.sum())
        if total == 0:
            return np.zeros((n, dim), dtype=np.float64)
        # concatenate the raw (int32 `th`) arrays first, convert once —
        # a per-array astype costs more than the whole scatter
        flat = np.concatenate([t for t in tok if t is not None and len(t)])
        # u32 reinterpret of the low 32 bits, exactly like emb_from_th;
        # int32 `th` gets it as a zero-copy view, and the narrow
        # (u32/i32) index math halves this kernel's per-batch memory
        # traffic — it runs in every python worker at once, so its
        # bytes-touched set the memory-bandwidth knee at wide
        # parallelism
        if flat.dtype == np.int32:
            u = flat.view(np.uint32)
        elif flat.dtype == np.uint32:
            u = flat
        else:
            u = (
                np.asarray(flat, dtype=np.int64) & np.int64(0xFFFFFFFF)
            ).astype(np.uint32)
        # u is non-negative, so & (dim-1) == % dim for power-of-2 dims
        slots = (
            (u & np.uint32(dim - 1)) if dim & (dim - 1) == 0
            else u % np.uint32(dim)
        ).astype(np.int32)
        pair_idx = np.repeat(np.arange(n, dtype=np.int32), lens)
        keys = pair_idx * np.int32(dim) + slots  # < n*dim, fits int32
        # the weights are ±1, so two integer bincounts replace the slow
        # float-weighted scatter; sums of ±1 are exact integers in
        # float64 (|sum| << 2^53), so this is bit-identical to the
        # scalar accumulation regardless of order
        pos = ((u >> np.uint32(20)) & np.uint32(1)) == 1
        M = (
            np.bincount(keys[pos], minlength=n * dim)
            - np.bincount(keys[~pos], minlength=n * dim)
        ).astype(np.float64).reshape(n, dim)
        # row norms with the SAME reduction the scalar path uses
        # (np.linalg.norm of a 1-D vector is sqrt(dot(v, v)))
        norms = np.sqrt(np.einsum("ij,ij->i", M, M))
        np.divide(M, norms[:, None], out=M, where=norms[:, None] > 0)
        # emb_from_th returns float32; the scoring dot upcasts to f64
        return M.astype(np.float32).astype(np.float64)

    ml = side_matrix(tok_l)
    mr = side_matrix(tok_r)
    return np.einsum("ij,ij->i", ml, mr)


# ------------------------------------------------------- numpy minhash
#: affine-permutation parameters (odd multiplier => bijection mod 2^64),
#: deterministic from blake2b; cached per (num_hashes)
_MINHASH_PARAMS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _minhash_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    got = _MINHASH_PARAMS.get(num_hashes)
    if got is None:
        a = np.array([_stable_u64(f"mh_a{i}", 2) | 1 for i in range(num_hashes)], dtype=np.uint64)
        b = np.array([_stable_u64(f"mh_b{i}", 3) for i in range(num_hashes)], dtype=np.uint64)
        got = (a, b)
        _MINHASH_PARAMS[num_hashes] = got
    return got


#: executor-lifetime token -> u64 cache for the minhash base hash
_MH_CACHE: dict[str, int] = {}


def _token_u64(t: str) -> int:
    h = _MH_CACHE.get(t)
    if h is None:
        h = _stable_u64(t, 4)
        if len(_MH_CACHE) < 4_000_000:
            _MH_CACHE[t] = h
    return h


def minhash_signature_py(tokens: list[str] | None, num_hashes: int = 64) -> list[int]:
    """Numpy MinHash: base token hash (cached blake2b) then `num_hashes`
    affine permutations mod 2^64, min per permutation. Deterministic
    across processes; signed-int64 reinterpretation for Spark LongType."""
    if not tokens:
        return [_MAX_LONG] * num_hashes
    a, b = _minhash_params(num_hashes)
    # no set(): duplicate tokens cannot change a min, and building a
    # PyObject set per doc costs more than the duplicate matmul rows
    # it would save; .tolist() converts at C speed
    hs = np.fromiter(
        (_token_u64(t) for t in tokens), dtype=np.uint64, count=len(tokens)
    )
    mixed = hs[:, None] * a[None, :] + b[None, :]  # uint64 wraparound
    return mixed.min(axis=0).astype(np.int64).tolist()


def make_minhash_sig_udf(num_hashes: int = 64):
    """Arrow-batched MinHash signature over a token/shingle array
    column — the numpy affine-permutation path. The JVM alternative
    (`minhash_signature`, an xxhash64 min-`aggregate`) evaluates
    INTERPRETED per element (HOFs never enter whole-stage codegen) and
    measured slower and worse-scaling on every corpus tried."""

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(tokens: pd.Series) -> pd.Series:
        return pd.Series(
            [
                minhash_signature_py(
                    list(t) if t is not None else None, num_hashes
                )
                for t in tokens
            ]
        )

    return _sig


def hot_u64_array(hot_tokens) -> np.ndarray:
    """The hot-token set as sorted u64 base hashes — the form
    `prepare_batch` excludes by. Hash-equality exclusion is value-
    identical to string `array_except` followed by hashing: every
    downstream consumer (MinHash, band keys) sees only the u64 hash, so
    a token is indistinguishable from a hot token exactly when their
    hashes collide (~2^-64 per token pair — negligible by design)."""
    return np.array(
        sorted({_token_u64(t) for t in (hot_tokens or ())}), dtype=np.uint64
    )


def prepare_batch(
    token_lists,
    hot_u64: np.ndarray,
    dim: int = 64,
    num_hashes: int = 64,
    include_emb: bool = True,
):
    """Batch-vectorized prepare kernel over a whole Arrow batch:
    hashes every token ONCE (one flat pass — the per-doc
    th/minhash pair used to hash each token twice), then derives

    - `th` per doc: sorted unique int32 top-halves via ONE lexsort +
      adjacent-dedup over the batch (replaces a per-doc `np.unique`),
    - `emb` per doc: `emb_from_th` on the th slice (kept per-doc so the
      "recompute emb exactly from th" invariant is true by construction),
    - `sig` per doc: MinHash over the hot-FILTERED hashes — the hot set
      arrives as u64 hashes (`hot_u64_array`), so no string
      `array_except` column ever ships through Arrow.

    Value-identical to th_from_tokens / emb_from_th /
    minhash_signature_py per doc (property-tested in
    tests/test_hashing.py::test_prepare_batch_matches_per_doc_kernels)."""
    n = len(token_lists)
    lens = np.zeros(n, dtype=np.int64)
    flat: list = []
    for i, tl in enumerate(token_lists):
        if tl is not None and len(tl):
            lens[i] = len(tl)
            flat.extend(tl)
    total = int(lens.sum())
    # factorize-then-hash: token strings repeat heavily inside a batch
    # (Zipfian corpus, 10k-row Arrow batches), so the Python-level
    # blake2b/dict lookup runs once per UNIQUE token and the batch hash
    # column is one C-speed gather — the dominant kernel cost was the
    # per-occurrence generator + dict.get loop (~64% of prepare CPU)
    if total:
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        if codes.min(initial=0) < 0:
            # factorize codes None/NaN elements as -1, and uh[-1] would
            # silently gather the LAST unique token's hash — fail loudly
            # instead, matching the replaced per-doc kernel (which raised
            # AttributeError on None.encode)
            raise ValueError("prepare_batch: null element inside a tokens array")
        uh = np.fromiter(
            (_token_u64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
        )
        hs = uh[codes]
    else:
        hs = np.empty(0, dtype=np.uint64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)

    # ---- th: per-doc sorted unique int32, one batch lexsort
    h32 = (hs >> np.uint64(32)).astype(np.int64).astype(np.int32)
    order = np.lexsort((h32, doc))
    d_s, h_s = doc[order], h32[order]
    keep = np.ones(total, dtype=bool)
    if total:
        keep[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
    d_u, h_u = d_s[keep], h_s[keep]
    starts = np.searchsorted(d_u, np.arange(n))
    ends = np.append(starts[1:], len(d_u))
    ths = [h_u[a:b] for a, b in zip(starts, ends)]

    # emb is a pure function of th (emb_from_th): consumers that only
    # ever read th — the arrow-mode pipeline, the streaming assigner —
    # skip computing AND shipping it (include_emb=False): dim*4 bytes
    # per doc less through Arrow and out of the persisted prepared
    # table, plus one fewer per-doc python pass in this kernel
    embs = [emb_from_th(t, dim) for t in ths] if include_emb else None

    # ---- sig: MinHash over hot-filtered hashes, per-doc C slices
    a_p, b_p = _minhash_params(num_hashes)
    if len(hot_u64):
        bmask = ~np.isin(hs, hot_u64)
        bh, bdoc = hs[bmask], doc[bmask]
    else:
        bh, bdoc = hs, doc
    bstarts = np.searchsorted(bdoc, np.arange(n))
    bends = np.append(bstarts[1:], len(bdoc))
    sentinel = np.full(num_hashes, _MAX_LONG, dtype=np.int64)
    sigs = [
        (bh[a:b, None] * a_p[None, :] + b_p[None, :]).min(axis=0).astype(np.int64)
        if b > a
        else sentinel
        for a, b in zip(bstarts, bends)
    ]
    return embs, sigs, ths


def make_prepare_udf(
    dim: int = 64, num_hashes: int = 64, hot_tokens=(), include_emb: bool = True
):
    """One Arrow pass computing the hashing-trick embedding (over the
    full token array — a matcher feature, must match training), the
    MinHash signature (over the hot-filtered blocking tokens) — blocking
    then needs no per-token work at all (band keys are cheap integer
    hashes over the signature slots) — and `th`, the SORTED UNIQUE
    64-bit token hashes of the full token set. Scoring ships `th`
    instead of the token strings: the pair shuffle carries 8-byte longs
    instead of ~15-byte strings, and the feature UDF computes Jaccard
    with a C-speed sorted-array intersect instead of building Python
    string sets per pair (PyObject churn is memory-bandwidth-bound and
    was the scoring stage's scaling bottleneck at high parallelism).

    `hot_tokens` (the corpus-hot census list) bakes into the closure as
    u64 hashes: the UDF takes ONLY the token array — the old two-column
    form shipped a second, hot-filtered copy of every token string
    through Arrow and hashed every token twice (`prepare_batch`)."""
    from pyspark.sql.types import StructField, StructType

    fields = [
        StructField("sig", ArrayType(LongType())),
        StructField("th", ArrayType(IntegerType())),
    ]
    if include_emb:
        fields.insert(0, StructField("emb", ArrayType(FloatType())))
    schema = StructType(fields)
    hot_hs = hot_u64_array(hot_tokens)

    @F.pandas_udf(schema)
    def _prep(tokens: pd.Series) -> pd.DataFrame:
        embs, sigs, ths = prepare_batch(
            tokens, hot_hs, dim, num_hashes, include_emb=include_emb
        )
        out = {"sig": sigs, "th": ths}
        if include_emb:
            out = {"emb": embs, **out}
        return pd.DataFrame(out)

    return _prep


# ------------------------------------------------- hyperplane band LSH
#: deterministic pseudo-random hyperplane coefficient matrices, cached
#: per (planes, dim) — blake2b-derived, no stored model
_PLANE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def plane_matrix(planes: int, dim: int) -> np.ndarray:
    """(dim, planes) deterministic hyperplane coefficients in [-1, 1]."""
    got = _PLANE_CACHE.get((planes, dim))
    if got is None:
        flat = np.array(
            [
                struct.unpack(
                    "<q",
                    hashlib.blake2b(struct.pack("<qq", p, i), digest_size=8).digest(),
                )[0]
                / float(1 << 63)
                for p in range(planes)
                for i in range(dim)
            ],
            dtype=np.float64,
        )
        got = flat.reshape(planes, dim).T  # (dim, planes)
        _PLANE_CACHE[(planes, dim)] = got
    return got


def _probe_masks(rows: int, probe_bits: int) -> list[int]:
    """All XOR masks over `rows` bits with 0..probe_bits bits set — the
    full hamming ball (multi-probe), not just single-bit flips."""
    from itertools import combinations

    masks = [0]
    for k in range(1, min(probe_bits, rows) + 1):
        masks += [sum(1 << b for b in combo) for combo in combinations(range(rows), k)]
    return masks


def hyperplane_band_keys_py(
    embs: np.ndarray, bands: int, rows: int, probe_bits: int = 0
) -> list[list[int]]:
    """Banded random-hyperplane signature: `bands` OR'd tables of `rows`
    sign bits each (the MinHash-band structure applied to hyperplane
    LSH). A pair with cosine c agrees per bit with p = 1 - acos(c)/pi,
    so P(some band collides) = 1-(1-p^rows)^bands — e.g. 0.996 at
    c=0.5 with bands=16, rows=3, vs ~4% for a single AND-of-8 signature
    (the round-1 recall hole). Key layout: (band_index << rows) | packed
    bits — collision-free across bands, no hash needed.

    With probe_bits > 0 each band also emits keys for every bit pattern
    within that hamming distance (query-side multi-probe).
    """
    planes = bands * rows
    m = plane_matrix(planes, embs.shape[1])
    bits = (embs @ m) >= 0  # (n, planes)
    vals = np.zeros((embs.shape[0], bands), dtype=np.int64)
    for b in range(bands):
        for j in range(rows):
            vals[:, b] |= bits[:, b * rows + j].astype(np.int64) << j
    masks = _probe_masks(rows, probe_bits)
    out = []
    for row_vals in vals:
        keys = []
        for b in range(bands):
            base = b << rows
            v = int(row_vals[b])
            keys.extend(base | (v ^ mask) for mask in masks)
        out.append(keys)
    return out


def make_hyperplane_bands_udf(dim: int, bands: int, rows: int, probe_bits: int = 0):
    """Arrow-batched UDF: embedding -> array<long> of band bucket keys.

    One numpy matmul per batch (vectorized over all rows x planes) —
    the scale path for banded hyperplane LSH; a static element_at
    expansion of bands*rows planes would blow past the codegen limits
    and fall back to interpreted evaluation."""

    @F.pandas_udf(ArrayType(LongType()))
    def _keys(emb: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype="object")
        arr = np.zeros((n, dim), dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i, e in enumerate(emb):
            if e is not None and len(e) == dim:
                arr[i] = np.asarray(e, dtype=np.float64)
                ok[i] = True
        keys = hyperplane_band_keys_py(arr, bands, rows, probe_bits)
        return pd.Series([k if ok[i] else None for i, k in enumerate(keys)])

    return _keys


def make_hash_embedding_udf(dim: int = 64):
    """Arrow-batched tokens -> hashing-trick embedding (the same
    emb_from_th(th_from_tokens(.)) every other path uses — one
    definition, bit-identical across prepare / training / streaming)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _emb(tokens: pd.Series) -> pd.Series:
        return pd.Series(
            [
                emb_from_th(
                    th_from_tokens(list(t) if t is not None else None), dim
                )
                for t in tokens
            ]
        )

    return _emb


hash_embedding_udf = make_hash_embedding_udf(64)
