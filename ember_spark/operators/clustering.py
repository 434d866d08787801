"""Transitive clustering: connected components over match edges.

GraphFrames-free alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) expressed as DataFrame self-joins — O(log^2 n) rounds even
on pathological chains, each round a groupBy + join. Lineage is
truncated every iteration with localCheckpoint (SURVEY.md §4 custom-op
3; the reference has no clustering stage — its ground-truth
`cluster_id` arrives with the data, `data/ali/README.md:41`).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: serializes the distributed loop's session-conf window (shuffle
#: width + AQE) across threads: two concurrent CC calls — e.g. two
#: streaming micro-batches — interleaving their save/set/restore would
#: otherwise capture each other's temporary values and leave the
#: session conf permanently wrong after both finish. Queries OUTSIDE
#: this module that plan during a CC loop still see the loop's conf
#: (session conf is global by design); callers running concurrent
#: unrelated queries should pass `partitions=` and accept AQE-off
#: windows, or use separate sessions.
_LOOP_CONF_LOCK = threading.Lock()


def _min_with_self(edges: DataFrame) -> DataFrame:
    """m(u) = min(N(u) ∪ {u}) for each src node of `edges`."""
    return (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", F.col("src")).alias("m"))
    )


def _large_star(edges: DataFrame, partitions: int | None = None) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u).

    ONE exchange: bidir is repartitioned by src once, and both the
    m-aggregation and the bidir-join-m reuse that partitioning (the
    naive groupBy-then-join plan pays two). No trailing distinct —
    star rounds are multiplicity-idempotent (duplicate edges change
    neither m(u) nor the output SET), and the small-star that always
    follows ends with the iteration's single dedup, so a dedup here
    was one full extra shuffle of the edge set per iteration. The
    driver-synchronized CC loop's per-iteration stage count is pure
    serial cost a 4x-wider cluster cannot shrink, so fewer exchanges
    per round is exactly what the scaling gate buys with this."""
    bidir = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if partitions:
        bidir = bidir.repartition(partitions, "src")
    m = _min_with_self(bidir)
    # shuffle-hash, not sort-merge: m is the per-key min table (small),
    # and SMJ would re-sort the full bidir edge set EVERY iteration —
    # measured as the cluster stage's main CPU at wide parallelism. No
    # broadcast: a broadcast build is driver-serial per iteration,
    # exactly the fixed cost the scaling gate punishes.
    return (
        bidir.join(m.hint("shuffle_hash"), "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame, partitions: int | None = None) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, connect all
    (plus the node itself) to the minimum. Same one-exchange shape as
    `_large_star`; the trailing distinct is the iteration's single
    edge-set dedup (it also feeds the convergence checksum, which
    compares SETS)."""
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    if partitions:
        canon = canon.repartition(partitions, "src")
    m = _min_with_self(canon)
    nbrs = canon.join(m.hint("shuffle_hash"), "src").select(
        F.col("dst").alias("node"), F.col("m")
    )
    selfs = m.select(F.col("src").alias("node"), F.col("m"))
    return (
        nbrs.union(selfs)
        .filter(F.col("node") != F.col("m"))
        .select(F.col("node").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-insensitive, overflow-free under ANSI mode
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_l",
    dst: str = "id_r",
    max_iterations: int = 20,
    partitions: int | None = None,
    checkpoint_dir: str | None = None,
    input_fp: str | None = None,
    cleanup: bool = True,
    local_threshold: int = 500_000,
    assume_distinct: bool = False,
    members_only: bool = False,
) -> DataFrame:
    """Compute connected components of an undirected edge list.

    Returns DataFrame (id, component) where component is the minimum
    node id in the component, for every node that appears in an edge
    (including self-loop-only nodes; callers union in never-paired
    singletons themselves). Node id column type must be orderable
    (long or string).

    `members_only`: emit rows ONLY for nodes whose component differs
    from themselves — component roots and self-loop-only nodes are
    OMITTED (identically on the local and distributed paths). A caller
    that re-attaches components to a full id table with a LEFT join +
    coalesce(component, id) (the pipeline's cluster stage, the
    streaming resolver) reconstructs every omitted self-mapping for
    free, so the nodes-distinct shuffle, the selfmap union and the
    input re-checkpoint this flag skips were pure overhead for that
    shape. Default False keeps the full contract (self-loop-only nodes
    map to themselves).

    `assume_distinct`: skip iteration 0's dedup shuffle when the edge
    list is distinct by construction (duplicates would only cost time,
    not correctness — star rounds are multiplicity-idempotent — but
    the iteration-0 checksum and local-path gate count raw rows).

    `checkpoint_dir`: per-iteration edge sets are written to reliable
    storage (parquet under this path) instead of localCheckpoint —
    localCheckpoint blocks live on executors and die with one, which on
    a real multi-executor cluster would fail an hours-long CC job near
    the end; with a checkpoint dir the loop also RESUMES from the last
    completed iteration after a driver restart. Iteration files live
    under an input-fingerprint subdirectory (the edge plan's semantic
    hash), so rerunning with a DIFFERENT graph at the same root can
    never serve the previous graph's iterations; existence checks go
    through the Hadoop FileSystem API, so hdfs:///s3a:// roots work,
    not just the driver's local disk.

    `input_fp`: explicit content fingerprint overriding the plan-shape
    semanticHash (which cannot see in-place mutation of an input path —
    pass e.g. a hash of the input files' (path, size, mtime) when the
    same plan may read changed data). When no fingerprint is available
    at all (semanticHash raises and no override), reuse is DISABLED:
    iterations go to a unique per-run subdirectory rather than a shared
    'nofp' bucket that a different graph could silently resume from.

    `cleanup`: after convergence, delete all iteration directories
    except the final one (the returned DataFrame lazily reads it).
    Callers may remove the whole fingerprint subdirectory once the
    result has been consumed/materialized.

    `local_threshold`: edge sets at or below this size (known for free
    from the iteration-0 checksum) run driver-local union-find instead
    of the distributed star loop — the loop is driver-synchronized, so
    on a small graph its per-iteration job latency (4+ shuffles x
    O(log^2 n) rounds) dwarfs the actual work; every real system gates
    a local solver the same way. The collect is BOUNDED at
    `local_threshold` edges (<= ~16 MB of longs at the default — the
    same class as the repo's other justified collects: quantizer and
    training samples), value-identical to the distributed path
    (property-tested), and out of play at scale: a 10^12-page corpus's
    match-edge set exceeds the bound by ~6 orders of magnitude, and the
    400k-entity scaling-evidence job provably stays on the distributed
    loop — its recorded trial detail has docs - predicted_entities =
    1,438,741 - 400,166 = 1,038,575 merges, each requiring a distinct
    match edge, so its edge set is > 2x the bound before counting any
    non-spanning edge. Gated to `checkpoint_dir is None`: a job that
    asked for durable iteration state keeps the resumable loop
    regardless of size. `local_threshold=0` forces the distributed
    path.
    """
    spark = edges.sparkSession

    # project FIRST so the checkpoint fingerprint below hashes the
    # graph actually being solved: hashing the raw input DataFrame
    # would give two calls with different src/dst column choices the
    # same fingerprint, and the second would silently resume the first
    # graph's iterations.
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))

    reuse = True
    if checkpoint_dir is not None:
        if input_fp is not None:
            in_fp = input_fp
        else:
            try:
                in_fp = f"{raw.semanticHash() & 0xFFFFFFFF:08x}"
            except Exception:
                import uuid

                in_fp = f"run_{uuid.uuid4().hex[:12]}"
                reuse = False
        ckpt_root = f"{checkpoint_dir}/{in_fp}"
        hconf = spark._jsc.hadoopConfiguration()
        jvm = spark._jvm

        def _hdfs_path(p: str):
            return jvm.org.apache.hadoop.fs.Path(p)

        def _hdfs_exists(p: str) -> bool:
            hp = _hdfs_path(p)
            return hp.getFileSystem(hconf).exists(hp)

        def _hdfs_delete(p: str) -> None:
            hp = _hdfs_path(p)
            hp.getFileSystem(hconf).delete(hp, True)

    def persist_iter(df: DataFrame, it: int) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=False)
        path = f"{ckpt_root}/cc_iter_{it:03d}"
        if not (reuse and _hdfs_exists(f"{path}/_SUCCESS")):
            df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # truncate the INPUT lineage once: `nodes` (read in the final
    # assembly action) and the iteration-0 edge set both derive from
    # this checkpoint — without it each reference re-executes the whole
    # upstream pipeline (blocking + scoring) once more. members_only
    # has a single consumer (iteration 0, itself checkpointed), so the
    # extra checkpoint of the same rows is skipped there. With a
    # checkpoint_dir the input goes to the SAME reliable storage as the
    # iterations: a localCheckpoint here would leave the final
    # nodes/selfmap assembly reading executor-local blocks — the exact
    # executor-loss failure the durable mode exists to survive.
    if not members_only:
        if checkpoint_dir is not None:
            in_path = f"{ckpt_root}/cc_input"
            if not (reuse and _hdfs_exists(f"{in_path}/_SUCCESS")):
                raw.write.mode("overwrite").parquet(in_path)
            raw = spark.read.parquet(in_path)
        else:
            raw = raw.localCheckpoint(eager=False)
        nodes = raw.select(F.col("src").alias("id")).union(
            raw.select(F.col("dst").alias("id"))
        ).distinct()
    def _checkpoint_rdd_id(df: DataFrame) -> int | None:
        """The id of the RDD a localCheckpoint'd DataFrame persists:
        its analyzed plan is a LogicalRDD wrapping exactly that RDD.
        Capturing it directly (instead of diffing the global persistent-
        RDD map before/after) means a concurrent thread persisting an
        unrelated RDD — e.g. a streaming micro-batch — can never be
        swept up and unpersisted by the local fast path below."""
        try:
            return df._jdf.queryExecution().analyzed().rdd().id()
        except Exception:
            return None

    # eager=False: the checkpoint materializes inside the checksum
    # action instead of spending a dedicated job per iteration — the
    # loop is driver-synchronized, so per-job latency is pure serial
    # cost that a 4x-wider cluster cannot shrink
    # assume_distinct: callers whose edge list is distinct BY
    # CONSTRUCTION (the pipeline's scored pairs are canonical id_l <
    # id_r, dedup'd at blocking) skip iteration 0's full dedup shuffle
    # of the edge table. Duplicate edges would not change the result
    # (star rounds are idempotent over multiplicity) — only iteration
    # cost — so this is a pure plan knob, but the default stays safe.
    e0 = raw.filter(F.col("src") != F.col("dst"))
    if not assume_distinct:
        e0 = e0.distinct()
    e = persist_iter(e0, 0)

    pdf = None
    if checkpoint_dir is None and local_threshold > 0:
        # small-graph gate as ONE bounded probe job: collect at most
        # local_threshold+1 edges — a result within the bound IS the
        # whole edge set (the fast path's input), so the former
        # checksum-count job + separate toPandas job collapse into one
        # driver round-trip (the CC call is driver-synchronized, so on
        # small graphs — every streaming micro-batch — per-job latency
        # is the dominant cost). An over-bound graph falls through to
        # the distributed loop having paid one bounded (<= ~16 MB of
        # longs) transfer, noise against the loop it precedes.
        pdf = e.limit(local_threshold + 1).toPandas()
        if len(pdf) > local_threshold:
            pdf = None

    if pdf is not None:
        # small-graph fast path (see docstring).
        # Union-by-min + path compression: rooting at the smaller id
        # keeps every root the minimum of its tree, so the final root
        # IS the component's min id — the exact distributed contract.
        from pyspark.sql import types as T
        # nothing below reads `e` again (the result references only the
        # collected pdf and nodes -> raw), so free its checkpoint blocks
        # now — a long-running stream calls this per micro-batch, and the
        # dead edge-set blocks would otherwise accumulate for the session
        # lifetime (the distributed path's final iteration IS the result,
        # so it has no equivalent release point)
        try:
            eid = _checkpoint_rdd_id(e)
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            if eid is not None and eid in jmap:
                jmap[eid].unpersist()
        except Exception:
            pass
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        srcs, dsts = pdf["src"].tolist(), pdf["dst"].tolist()
        for u, v in zip(srcs, dsts):
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        ids = sorted(set(srcs).union(dsts))
        if members_only:
            # match the distributed star-forest semantics EXACTLY: a
            # root maps to itself and is OMITTED (the caller's left
            # join + coalesce reconstructs it). Emitting root rows here
            # would make the members_only row set depend on which side
            # of local_threshold the input landed.
            ids = [i for i in ids if find(i) != i]
        id_type = e.schema["src"].dataType
        import pandas as pd

        # pandas + explicit schema: Arrow-batched transfer, not a
        # per-row pickle of ~|V| python tuples
        members = spark.createDataFrame(
            pd.DataFrame({"id": ids, "component": [find(i) for i in ids]}),
            T.StructType(
                [
                    T.StructField("id", id_type),
                    T.StructField("component", id_type),
                ]
            ),
        )
        if members_only:
            # `ids` was filtered to non-roots above, matching the
            # distributed star forest row-for-row
            return members
        # same final assembly as the distributed path: self-loop-only
        # nodes appear in `nodes` but not in `e` and map to themselves
        selfmap = nodes.withColumn("component", F.col("id"))
        return (
            members.union(selfmap)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )

    prev = _checksum(e)

    # CC is a driver-synchronized loop of small shuffles; with a wide
    # session shuffle width each round pays per-task overhead on near-
    # empty partitions. Size the loop's shuffle width to the edge count
    # (~500k edges per partition) and restore the session conf after.
    # AQE is disabled inside the loop for the same reason: re-planning
    # every tiny shuffle adds a scheduling round per stage and the
    # loop's shuffle width is already sized here.
    conf_key = "spark.sql.shuffle.partitions"
    aqe_key = "spark.sql.adaptive.enabled"
    with _LOOP_CONF_LOCK:
        old_parts = spark.conf.get(conf_key)
        old_aqe = spark.conf.get(aqe_key)
        cc_parts = partitions or max(8, min(int(old_parts), prev[0] // 500_000 + 1))
        spark.conf.set(conf_key, str(cc_parts))
        spark.conf.set(aqe_key, "false")
        try:
            for it in range(1, max_iterations + 1):
                e = persist_iter(
                    _small_star(_large_star(e, cc_parts), cc_parts), it
                )
                cur = _checksum(e)
                if cur == prev:
                    break
                prev = cur
            else:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iterations} iterations"
                )
        finally:
            spark.conf.set(conf_key, old_parts)
            spark.conf.set(aqe_key, old_aqe)

    if checkpoint_dir is not None and cleanup:
        # converged: iterations before the fixpoint are dead weight —
        # the returned DataFrame only reads the FINAL iteration dir, and
        # a resume after this point recomputes (identically) anything
        # missing, so deleting the prefix is safe for both.
        for dead in range(it):
            _hdfs_delete(f"{ckpt_root}/cc_iter_{dead:03d}")

    # fixpoint edge set is a star forest: src -> root(dst); nodes never
    # emitted (roots, self-loop-only, isolated-in-input) map to themselves
    members = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    if members_only:
        # the groupBy stays even here: it is the safety net should a
        # checksum-equal state ever carry a node under two components
        # (never observed; the Kiveris fixpoint is a star forest) —
        # what members_only skips is the nodes-distinct shuffle, the
        # selfmap union, and the raw checkpoint, the costs that exist
        # only to emit rows the caller's own left join reconstructs.
        return members.groupBy("id").agg(F.min("component").alias("component"))
    selfmap = nodes.withColumn("component", F.col("id"))
    return members.union(selfmap).groupBy("id").agg(F.min("component").alias("component"))
