"""Deduplication operators over a document table — the training-data
pipeline surface (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup). Each returns a DataFrame and is exposed through
`__spark_entry__.queries()`.

Scale notes: every variant is blocking-based (no crossJoin). Exact
dedup is one hash groupBy; LSH variants shuffle on band keys with the
hot-block cap from blocking.py; verification joins carry only the
columns the predicate needs (Catalyst prunes the scan accordingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ember_spark.functions.hashing import make_hyperplane_bands_udf, simhash64_df
from ember_spark.functions.similarity import (
    cosine_sim,
    dot_fixed,
    hash_tokens,
    jaccard_from_hashed,
    token_jaccard,
)
from ember_spark.functions.text import normalize_text
from ember_spark.functions.tokenize import char_ngrams, tokenize_ws
from ember_spark.operators.blocking import (
    DEFAULT_BLOCK_CAP,
    _pairs_from_keys,
    cap_hot_blocks,
    ensure_parallelism,
    lsh_candidate_pairs,
)


# ------------------------------------------------------------------ exact
def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalized: bool = False
) -> DataFrame:
    """Exact duplicate groups by content hash: one row per duplicated
    content with the canonical (min) id and the group size.
    """
    key = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(key).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .filter(F.col("dup_count") >= 2)
    )


def distinct_by_content(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per exact content — the dedup *apply* step."""
    w_min = (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_min.select(id_col), id_col, "left_semi")


# ----------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    use_words: bool = True,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard within an exact block
    (brute-force inside blocks — the small-block/oracle-checkable path;
    use minhash_lsh_dedup for unblocked web scale).

    `block_col` is required: without it every row lands in one block and
    the self-join degenerates to an all-pairs cartesian — a silent
    O(n^2) at corpus scale. Tiny-fixture/oracle callers may opt in
    explicitly with allow_unblocked=True.
    """
    if block_col is None and not allow_unblocked:
        raise ValueError(
            "ngram_jaccard_pairs without block_col is an all-pairs cartesian; "
            "pass block_col=... , or use minhash_lsh_dedup for unblocked "
            "near-dup at scale, or opt in with allow_unblocked=True on "
            "small fixtures"
        )
    toks = tokenize_ws(F.col(text_col))
    if use_words:
        grams = word_shingles(toks, n)
    else:
        grams = char_ngrams(normalize_text(F.col(text_col)), n)

    # grams are hashed ONCE per doc; each pair then intersects long
    # arrays (not n-gram strings) and |A u B| is inclusion-exclusion
    # over the precomputed distinct sizes — value-identical jaccard.
    # ensure_parallelism: the shingle+hash projection must not inherit
    # a narrow single-file scan's partitioning (see blocking.py).
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), hash_tokens(grams).alias("grams")
    ).withColumn("ng", F.size("grams"))
    if block_col:
        base = base.join(
            df.select(F.col(id_col).alias("id"), F.col(block_col).alias("bk")), "id"
        )
    else:
        base = base.withColumn("bk", F.lit(1))
    left = base.select(
        F.col("bk"), F.col("id").alias("id_l"),
        F.col("grams").alias("g_l"), F.col("ng").alias("n_l"),
    )
    right = base.select(
        F.col("bk"), F.col("id").alias("id_r"),
        F.col("grams").alias("g_r"), F.col("ng").alias("n_r"),
    )
    return (
        left.join(right, "bk")
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn(
            "jaccard",
            jaccard_from_hashed(
                F.col("g_l"), F.col("g_r"), F.col("n_l"), F.col("n_r")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


# ------------------------------------------------------------ minhash lsh
def word_shingles(tokens, n: int = 3):
    """Word n-gram shingles over a token array (native). Shorter docs
    collapse to one whole-doc shingle."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    return F.when(F.size(tokens) < n, F.array(F.array_join(tokens, " "))).otherwise(grams)


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    rows: int = 2,
    cap: int = DEFAULT_BLOCK_CAP,
    shingle: int = 1,
    verify_shingles: bool = False,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by exact Jaccard ≥ threshold
    (shingle→minhash→band→bucket-join→verify).

    shingle>1 minhashes word n-gram shingles instead of unigrams —
    essential on corpora with a small shared vocabulary, where unigram
    MinHash collides almost everywhere. With verify_shingles=True the
    verify step uses the SAME shingle sets the signature hashes (the
    standard web-dedup semantics: the threshold applies to the shingled
    representation, and LSH recall is then provable from (bands, rows));
    the default keeps unigram-Jaccard verification.
    """
    tok_expr = tokenize_ws(F.col(text_col))
    sig_expr = word_shingles(tok_expr, shingle) if shingle > 1 else tok_expr
    verify_expr = sig_expr if verify_shingles else tok_expr
    # three consumers (signature, verify-left, verify-right) — truncate
    # the tokenize+shingle lineage once or it recomputes per reference.
    # EAGER localCheckpoint, not persist(): persist'd plans stay in the
    # session CacheManager until an explicit unpersist (a storage leak
    # for library callers), while checkpoint blocks are released by the
    # ContextCleaner when the returned DataFrame is dropped; eager
    # because concurrent consumers convoy on a lazy checkpoint's
    # block-store locks while holding execution slots (measured
    # +30-100% wall on a 5M-pair stage at 8 cores).
    # verify keeps STRING token sets deliberately: LSH prunes candidates
    # to ~O(dups) pairs, so per-pair jaccard cost is negligible and the
    # regime favors minimal per-DOC prep — hashing every shingle first
    # (hash_tokens) doubles the interpreted-HOF prep for nothing here
    # (measured 2x prep at sf0.1). The hashed-verify rewrite belongs to
    # the high pairs-per-doc regime (ngram_jaccard_pairs, x5).
    # ensure_parallelism BEFORE the projection: tokenize+shingle (and
    # the MinHash signature UDF downstream, which keeps this
    # partitioning through the checkpoint) otherwise serialize onto the
    # scan's partition count — one core behind a small single-file input.
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(verify_expr).alias("tokens"),
        sig_expr.alias("sig_tokens"),
    ).localCheckpoint()
    cands = lsh_candidate_pairs(
        toks, "id", "sig_tokens", num_hashes=num_hashes, bands=bands, rows=rows, cap=cap
    )
    l = toks.select(F.col("id").alias("id_l"), F.col("tokens").alias("t_l"))
    r = toks.select(F.col("id").alias("id_r"), F.col("tokens").alias("t_r"))
    return (
        cands.join(l, "id_l")
        .join(r, "id_r")
        .withColumn("jaccard", token_jaccard(F.col("t_l"), F.col("t_r")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


# ---------------------------------------------------------------- simhash
def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    cap: int = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit SimHash, banded into
    (max_hamming+1) chunks — two docs within `max_hamming` bits must
    share at least one exact chunk (pigeonhole) — verified by full
    hamming distance.
    """
    chunks = max_hamming + 1
    bits = 64 // chunks
    sh = simhash64_df(
        ensure_parallelism(df).select(
            F.col(id_col).alias("id"), tokenize_ws(F.col(text_col)).alias("toks")
        ),
        "id",
        "toks",
    )
    banded = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    # chunk c: bits [c*bits, (c+1)*bits) + chunk id in the key
                    F.xxhash64(
                        F.lit(c),
                        F.shiftrightunsigned(F.col("simhash"), c * bits).bitwiseAND(
                            F.lit((1 << bits) - 1)
                        ),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("band", "block_key"),
    ).select("id", "simhash", "block_key")
    banded = cap_hot_blocks(banded, "block_key", cap)
    left = banded.select("block_key", F.col("id").alias("id_l"), F.col("simhash").alias("h_l"))
    right = banded.select("block_key", F.col("id").alias("id_r"), F.col("simhash").alias("h_r"))
    return (
        left.join(right, "block_key")
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn("hamming", F.bit_count(F.col("h_l").bitwiseXOR(F.col("h_r"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_l", "id_r", "hamming")
        .dropDuplicates(["id_l", "id_r"])
    )


# ------------------------------------------------------- embedding neardup
def embedding_neardup(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 16,
    rows: int = 3,
    cap: int = DEFAULT_BLOCK_CAP,
    brute_force: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    Scale path: BANDED random-hyperplane LSH — `bands` OR'd tables of
    `rows` sign bits each (same structure as the MinHash bands), so a
    pair only needs ONE band of bits to agree. A single AND-of-all-
    planes signature (round-1 design) had ~4% recall at cosine 0.5;
    bands=16 x rows=3 gives ~0.996 there and ~1-3e-8 at 0.7+
    (p_bit = 1 - acos(c)/pi, P = 1-(1-p^rows)^bands). Candidates are
    verified by exact cosine >= threshold, so precision is exact.

    With brute_force=True skips bucketing (the oracle-checkable
    baseline). `dim` (inferred from the first row when None) sizes the
    numpy plane matrix.
    """
    if brute_force:
        base = emb_df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e"))
        l = base.select(F.col("id").alias("id_l"), F.col("e").alias("e_l"))
        r = base.select(F.col("id").alias("id_r"), F.col("e").alias("e_r"))
        return (
            l.crossJoin(r)
            .filter(F.col("id_l") < F.col("id_r"))
            .withColumn("cos", cosine_sim(F.col("e_l"), F.col("e_r")))
            .filter(F.col("cos") >= threshold)
            .select("id_l", "id_r", "cos")
        )
    if dim is None:
        # first NON-NULL row: F.size(null) = -1 would silently disable
        # every banding key; an empty corpus raises clearly instead of
        # TypeError on first()'s None
        row = (
            emb_df.filter(F.col(emb_col).isNotNull())
            .select(F.size(F.col(emb_col)).alias("d"))
            .first()
        )
        if row is None:
            raise ValueError(
                "embedding_neardup: cannot infer dim from an empty or"
                " all-null-embedding input; pass dim="
            )
        dim = int(row["d"])
    keys_udf = make_hyperplane_bands_udf(dim, bands, rows)
    base = ensure_parallelism(emb_df).select(
        F.col(id_col).alias("id"), F.col(emb_col).alias("e")
    )
    # (id, key) only through the explode + grouped combinations: the
    # embedding payload re-attaches per verified candidate, keeping the
    # banded shuffle narrow. Pair generation scans the banded lineage
    # ONCE (blocking._pairs_from_keys — one exchange, no self-join), so
    # the Arrow matmul runs once with no checkpoint needed.
    banded = base.select(
        "id", F.explode(keys_udf(F.col("e"))).alias("block_key")
    )
    banded = cap_hot_blocks(banded, "block_key", cap)
    cands = _pairs_from_keys(banded, "id", "block_key").dropDuplicates(
        ["id_l", "id_r"]
    )
    # per-RECORD norm, computed once before the pair join. Two reasons:
    # (1) scale — the norm is a record quantity; inside the join it was
    # recomputed twice per candidate pair (2*dim multiplies x pairs);
    # (2) codegen — 3*dim unrolled element_at terms fused into the
    # broadcast-join consume overflow the JVM's 64KB generated-method
    # limit, and Spark's compile-failure fallback then interprets the
    # WHOLE verify stage (observed: "Code grows beyond 64 KB" at
    # dim=64). With norms hoisted, the per-pair expression is a single
    # dim-term dot, which compiles. Float-identical to the old form:
    # same unrolled left-to-right sums, same dot/(na*nb) division.
    withn = base.withColumn("n", F.sqrt(dot_fixed(F.col("e"), F.col("e"), dim)))
    l = withn.select(
        F.col("id").alias("id_l"), F.col("e").alias("e_l"), F.col("n").alias("n_l")
    )
    r = withn.select(
        F.col("id").alias("id_r"), F.col("e").alias("e_r"), F.col("n").alias("n_r")
    )
    dot = dot_fixed(F.col("e_l"), F.col("e_r"), dim)
    cos = F.when(
        (F.col("n_l") == 0) | (F.col("n_r") == 0), F.lit(0.0)
    ).otherwise(dot / (F.col("n_l") * F.col("n_r")))
    return (
        cands.join(l, "id_l")
        .join(r, "id_r")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_l", "id_r", "cos")
    )
