"""Skew-join salting: the third leg of the repo's skew toolkit.

The near-dup/blocking paths control skew BEFORE their joins
(`cap_hot_blocks`, hot-token census) and AQE's skew-join splitter is
on as a runtime backstop, but both have gaps a 100 TB pipeline hits:
the cap DROPS hot keys (right for boilerplate blocks, wrong when every
row must be kept — e.g. attaching a per-domain profile to a corpus
where one domain is 30% of the crawl), and AQE can only split
post-shuffle partitions of a sort-merge join, not the single straggler
task of a shuffled hash join's hottest key.

`salted_join` keeps every row: the fat side's key is extended with a
deterministic salt in [0, salt), the compact side is replicated salt
ways (an explode over `sequence`, JVM-side), and the equi-join runs on
(key, salt) — the hot key's rows now land on `salt` different
reducers. Cost model: replication multiplies the compact side by
`salt`, so this is for fat x compact shapes (fact x dimension too big
or too skewed to broadcast); for compact sides that fit in memory
`broadcast()` is strictly better, and the pipeline's default
shuffle-join is right when keys are uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fat: DataFrame,
    compact: DataFrame,
    on: list[str] | str,
    salt: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join `fat` (skewed keys, every row kept) with `compact`
    (replicated `salt` times) on (on..., salt).

    The salt is deterministic — `xxhash64` of `salt_cols` (default: all
    of the fat side's non-join columns) mod `salt` — so the same input
    always routes the same way (resumable jobs, stable plans); it only
    needs to SPREAD a hot key's rows, not be secret or uniform per row.

    `how` supports 'inner' and 'left' (the shapes where every fat row
    must survive; 'right'/'full' would need salt-aware null handling on
    the replicated side and are refused rather than silently wrong).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        # pmod(x, 0) is NULL (non-ANSI) and sequence(0, -1) is [0,-1]:
        # salt=0 silently returned an EMPTY inner join / all-null left
        # join — fail loudly for dynamically-computed salt factors
        raise ValueError(f"salted_join: salt must be >= 1, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    if "_salt" in fat.columns or "_salt" in compact.columns:
        # withColumn would silently overwrite a user's _salt column and
        # drop() would then erase it from the output — refuse instead
        raise ValueError("salted_join: input already has a '_salt' column")
    hash_cols = salt_cols or [c for c in fat.columns if c not in keys]
    if not hash_cols:
        hash_cols = keys  # degenerate: key-only fat side
    fat_s = fat.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(salt))
    )
    compact_s = compact.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return fat_s.join(compact_s, keys + ["_salt"], how).drop("_salt")


def salted_join_hot(
    fat: DataFrame,
    compact: DataFrame,
    on: str,
    hot_keys: list,
    salt: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Split-join: salt ONLY the rows whose key is in `hot_keys` (a
    small census-provided list — at most 1/trigger_frac keys); the cold
    majority takes the plain join.

    `salted_join` replicates the WHOLE compact side `salt` times, which
    is the right shape only when most keys are hot; when a census has
    already named the hubs, replicating everything multiplies the
    compact side's shuffle+sort by `salt` for keys that never needed
    spreading (measured: 2.7x the plain join's wall at salt=16 on a 30%
    single-hub table — scripts/microbench.py). Here the replicated
    relation is `len(hot_keys) * salt` rows, so the salted plan costs
    the plain plan plus epsilon while still capping any reducer at
    roughly 1/salt of a hub's rows. Every fat row lands in exactly one
    branch, so the fat side is shuffled once in aggregate; the union is
    a no-shuffle concatenation of the two joins' outputs.

    Same row-identity contract as `salted_join` (inner/left only); the
    cold branch keeps null-key rows (isin() is null for nulls), which
    a left join must preserve and an inner join drops either way.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join_hot supports inner/left, got {how!r}")
    if not hot_keys:
        return fat.join(compact, on, how)
    is_hot = F.col(on).isin(list(hot_keys))
    hot = salted_join(
        fat.filter(is_hot),
        compact.filter(is_hot),
        on,
        salt=salt,
        how=how,
        salt_cols=salt_cols,
    )
    cold = fat.filter(F.col(on).isNull() | ~is_hot).join(compact, on, how)
    return hot.unionByName(cold)
