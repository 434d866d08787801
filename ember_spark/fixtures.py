"""Deterministic synthetic corpus generator (FIXTURES.md §1-4).

Produces the `pages(url, warc_ts, html, text, lang)` input table of
BASELINE.json::input_hint with planted entity clusters, plus the
`labels(url, cluster_id)` ground truth and an ember-shaped
`labeled_pairs` benchmark (pos = same cluster, neg = sibling/random
cross-cluster; `build_ali_dataset.py:60-217` semantics at small scale).

Generation is a pure function of (seed, n_entities): entity ids come
from `spark.range`, per-entity rows from one `mapInPandas` whose RNG is
re-seeded per entity with blake2b(seed, entity) — deterministic,
partition-order-independent, and it scales out (no driver-side data).
"""

from __future__ import annotations

import hashlib
import html as html_mod
import random
import struct
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 5000
COMMON_TOKENS = ["the", "shop", "buy", "best"]  # shared across all entities
FAMILY_SIZE = 8          # entities per "similar cluster" family (hard negatives)
FAMILY_BASE = 12         # token pool per family
KEEP_FROM_FAMILY = 4     # family tokens kept per entity (cross-sibling overlap)
ENTITY_EXTRA = 8         # entity-specific tokens
#: per-entity long-form description tokens (drawn from a 10x vocab so
#: they stay entity-specific). Real Common-Crawl product/news pages
#: carry hundreds of tokens of body text, not a 12-token title — the
#: pipeline must be exercised (and benchmarked) at realistic document
#: weight: tokenization, MinHash, embedding, and pair features all
#: scale with tokens/doc.
DESC_TOKENS = 96
DESC_VOCAB = VOCAB_SIZE * 10
DROP_PROB = 0.15         # per-record token dropout
NOISE_PROB = 0.3         # per-record extra noise token
SINGLETON_FRAC = 0.35    # fraction of entities with a single record
ZH_FRAC = 0.1            # fraction of zh-language entities
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
LABELS_SCHEMA = "url string, cluster_id long"


def _rng(seed: int, *parts: int) -> random.Random:
    h = hashlib.blake2b(struct.pack("<q" + "q" * len(parts), seed, *parts), digest_size=8).digest()
    return random.Random(struct.unpack("<Q", h)[0])


def _vocab_word(i: int) -> str:
    return f"tok{i:04d}"


def _zh_word(i: int) -> str:
    # two CJK-ideograph chars per "word"
    return chr(0x4E00 + (i * 2) % 2000) + chr(0x4E00 + (i * 2 + 1) % 2000)


def _entity_tokens(seed: int, entity: int, zh: bool) -> list[str]:
    fam = entity // FAMILY_SIZE
    fam_rng = _rng(seed, 1, fam)
    word = _zh_word if zh else _vocab_word
    fam_pool = [word(fam_rng.randrange(VOCAB_SIZE)) for _ in range(FAMILY_BASE)]
    ent_rng = _rng(seed, 2, entity)
    kept = ent_rng.sample(fam_pool, KEEP_FROM_FAMILY)
    extra = [word(ent_rng.randrange(VOCAB_SIZE)) for _ in range(ENTITY_EXTRA)]
    # long-form body: description tokens. 3/4 entity-specific, 1/4 from
    # a per-family description pool (sibling entities share category
    # terminology — keeps hard negatives HARD at realistic doc length:
    # sibling jaccard ~0.13 vs ~0.02 random vs ~0.7 true duplicates).
    # zh bodies stay shorter — char-bigram tokenization doubles their
    # effective token count downstream.
    n_desc = DESC_TOKENS // 4 if zh else DESC_TOKENS
    desc_word = _zh_word if zh else (lambda i: f"w{i:05d}")
    pool_sz = max(n_desc // 2, 1)
    fam_desc_pool = [desc_word(fam_rng.randrange(DESC_VOCAB)) for _ in range(pool_sz)]
    n_fam = min(max(n_desc // 3, 1), pool_sz)
    desc = ent_rng.sample(fam_desc_pool, n_fam) + [
        desc_word(ent_rng.randrange(DESC_VOCAB)) for _ in range(n_desc - n_fam)
    ]
    return kept + extra + desc


def _record_text(seed: int, entity: int, rec: int, base: list[str], zh: bool) -> str:
    r = _rng(seed, 3, entity, rec)
    toks = [t for t in base if r.random() > DROP_PROB] or base[:1]
    if not zh:
        # word order varies per record (whitespace tokenization is
        # order-insensitive); zh keeps order so char-bigram token sets
        # stay comparable across records of one entity
        r.shuffle(toks)
        toks = toks + COMMON_TOKENS
        if r.random() < NOISE_PROB:
            toks.append(f"n{r.randrange(10**6)}&x")  # '&' exercises html escaping
        return " ".join(toks)
    return "".join(toks)


def _cluster_size(seed: int, entity: int) -> int:
    r = _rng(seed, 4, entity)
    if r.random() < SINGLETON_FRAC:
        return 1
    return 2 + r.randrange(7)  # 2..8 records per duplicated entity


def _is_zh(seed: int, entity: int) -> bool:
    return _rng(seed, 5, entity).random() < ZH_FRAC


def _page_rows(seed: int, entity: int) -> list[dict]:
    zh = _is_zh(seed, entity)
    base = _entity_tokens(seed, entity, zh)
    size = _cluster_size(seed, entity)
    rows = []
    for rec in range(size):
        text = _record_text(seed, entity, rec, base, zh)
        url = f"https://shop{entity % 97}.example.com/item/{entity}/{rec}"
        page_html = (
            "<html><head><title>fixture</title></head><body>"
            f"<main>{html_mod.escape(text)}</main></body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + timedelta(seconds=entity * 31 + rec),
                "html": page_html,
                "text": text,
                "lang": "zh" if zh else ["en", "de", "es"][entity % 3],
                "cluster_id": entity,
            }
        )
    return rows


def generate_pages(
    spark: SparkSession, n_entities: int, seed: int = 142, partitions: int | None = None
) -> DataFrame:
    """pages + cluster_id column (split off labels with `split_labels`).

    Distributed: one task generates the records of a contiguous entity
    range; determinism comes from per-entity RNG seeding only.
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    ents = spark.range(0, n_entities, 1, parts)

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for e in pdf["id"].tolist():
                rows.extend(_page_rows(seed, int(e)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang", "cluster_id"]
            )

    return ents.mapInPandas(gen, schema=PAGES_SCHEMA + ", cluster_id long")


def split_labels(pages_with_cluster: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (pages per input_hint schema, labels(url, cluster_id))."""
    pages = pages_with_cluster.select("url", "warc_ts", "html", "text", "lang")
    labels = pages_with_cluster.select("url", "cluster_id")
    return pages, labels


# ------------------------------------------------------- labeled pairs
def generate_labeled_pairs(
    spark: SparkSession, n_entities: int, seed: int = 142, neg_per_pos: int = 3
) -> DataFrame:
    """ember-shaped labeled pair benchmark over the same synthetic corpus.

    Positives: all within-cluster pairs (clusters are small). Negatives:
    `neg_per_pos` per positive — half "hard" (sibling entities of the
    same family, the analog of ember's top-similar-cluster negatives,
    `build_ali_dataset.py:164-198`), half random cross-family. Driver
    builds only the pair *indices*; texts come from the deterministic
    generator, so this is independent of the engine under test.
    """
    rng = _rng(seed, 6, n_entities)
    rows = []

    def rec_pair(e1: int, r1: int, e2: int, r2: int, label: int):
        zh1, zh2 = _is_zh(seed, e1), _is_zh(seed, e2)
        t1 = _record_text(seed, e1, r1, _entity_tokens(seed, e1, zh1), zh1)
        t2 = _record_text(seed, e2, r2, _entity_tokens(seed, e2, zh2), zh2)
        u1 = f"https://shop{e1 % 97}.example.com/item/{e1}/{r1}"
        u2 = f"https://shop{e2 % 97}.example.com/item/{e2}/{r2}"
        (u1, t1, e1c, u2, t2, e2c) = (
            (u1, t1, e1, u2, t2, e2) if u1 < u2 else (u2, t2, e2, u1, t1, e1)
        )
        rows.append(
            {
                "url_left": u1,
                "url_right": u2,
                "text_left": t1,
                "text_right": t2,
                "lang_left": "zh" if zh1 else ["en", "de", "es"][e1 % 3],
                "lang_right": "zh" if zh2 else ["en", "de", "es"][e2 % 3],
                "cluster_id_left": e1c,
                "cluster_id_right": e2c,
                "label": label,
            }
        )

    sizes = {e: _cluster_size(seed, e) for e in range(n_entities)}
    n_pos = 0
    for e, size in sizes.items():
        for r1 in range(size):
            for r2 in range(r1 + 1, size):
                rec_pair(e, r1, e, r2, 1)
                n_pos += 1
    n_neg = n_pos * neg_per_pos
    for i in range(n_neg):
        if i % 2 == 0:  # hard: same family, different entity
            e1 = rng.randrange(n_entities)
            fam = e1 // FAMILY_SIZE
            e2 = fam * FAMILY_SIZE + rng.randrange(FAMILY_SIZE)
            if e2 == e1 or e2 >= n_entities:
                e2 = (e1 + 1) % n_entities
        else:  # random cross-family
            e1, e2 = rng.randrange(n_entities), rng.randrange(n_entities)
            if e1 == e2:
                e2 = (e1 + 1) % n_entities
        rec_pair(e1, rng.randrange(sizes[e1]), e2, rng.randrange(sizes[e2]), 0)

    pdf = pd.DataFrame(rows).drop_duplicates(["url_left", "url_right"])
    return spark.createDataFrame(pdf)


# --------------------------------------------- attrs_raw (byte-identity fixture)
def generate_attrs_raw(spark: SparkSession, n: int = 200, seed: int = 142) -> DataFrame:
    """Separator-encoded attribute rows + golden `expected_text` computed
    by the pure-Python oracle (FIXTURES.md §4)."""
    from ember_spark.functions.text import serialize_attrs_py, strip_separators_py

    rng = _rng(seed, 7, n)
    rows = []
    for i in range(n):
        choice = rng.randrange(6)
        title = [None, "", "widget pro", "a  b", "0", "x#:#y"][choice]
        kvs = rng.randrange(4)
        pv = None if kvs == 0 else "#;#".join(f"k{j}#:#v{rng.randrange(9)}" for j in range(kvs))
        if rng.random() < 0.2:
            pv = ""
        expected = serialize_attrs_py([title, strip_separators_py(pv)])
        rows.append({"id": i, "title": title, "pv_pairs": pv, "expected_text": expected})
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "title", "pv_pairs", "expected_text"]),
        schema="id long, title string, pv_pairs string, expected_text string",
    )
