"""Physical-plan audit: verify predicate pushdown, column pruning,
broadcast joins, and no row-wise Python on the hot path. Prints a
compact PASS/FAIL per assertion; run after plan-affecting changes."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

from ember_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    return buf.getvalue()


def check(name: str, cond: bool, detail: str = "") -> bool:
    print(f"{'PASS' if cond else 'FAIL'} {name} {detail}")
    return cond


def main() -> int:
    spark = get_spark("explain_audit", cores=8, shuffle_partitions=8)
    qs = entry_mod.queries()
    ok = True

    # TPC-H Q1: filter pushed to parquet + pruned read schema
    p = plan_of(qs["tpch_q1"](spark, SF))
    ok &= check("q1_pushdown", "PushedFilters: [IsNotNull(l_shipdate)" in p or "LessThanOrEqual(l_shipdate" in p)
    ok &= check("q1_column_pruning", "l_comment" not in p and "l_partkey" not in p)

    # join+agg: nation broadcast
    p = plan_of(qs["j1_join_agg"](spark, SF))
    ok &= check("j1_broadcast", "BroadcastHashJoin" in p)

    # semi/anti joins are real semi/anti, not materialized distinct+join
    p = plan_of(qs["f1_semi_join"](spark, SF))
    ok &= check("semi_join", "LeftSemi" in p)
    p = plan_of(qs["j3_anti_join"](spark, SF))
    ok &= check("anti_join", "LeftAnti" in p)

    # scoring stage: Arrow-vectorized python only
    p = plan_of(qs["er_pipeline_entities"](spark, SF))
    ok &= check("no_rowwise_python", "BatchEvalPython" not in p)
    ok &= check("arrow_python", "ArrowEvalPython" in p or "MapInPandas" in p)

    # whole-stage codegen on the aggregation path (AQE hides codegen
    # subtrees in pre-execution explain, so toggle it off for the check)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = codegen_of(qs["a1_groupby_count"](spark, SF))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    ok &= check("wholestage_codegen", "WholeStageCodegen" in p and "Found 0" not in p)

    # lsh dedup: no cartesian anywhere (every public near-dup API must
    # block; the unblocked ngram path now raises instead of degrading)
    p = plan_of(qs["minhash_lsh_dedup"](spark, SF))
    ok &= check("no_cartesian_in_lsh", "CartesianProduct" not in p)
    p = plan_of(qs["embedding_neardup_lsh"](spark, SF))
    ok &= check("no_cartesian_in_embedding_lsh", "CartesianProduct" not in p)
    p = plan_of(qs["ann_lsh_topk"](spark, SF))
    ok &= check("no_cartesian_in_ann_lsh", "CartesianProduct" not in p)
    # IVF probe is an equi-join on the inverted-list id (the one
    # intentional cross join in the repo is brute_force_topk's exact
    # baseline, broadcast over a tiny query side)
    p = plan_of(qs["ann_ivf_topk"](spark, SF))
    ok &= check("no_cartesian_in_ann_ivf", "CartesianProduct" not in p)

    # benchmark builder: cluster-profile similarity + pair sampling are
    # keyed joins + windows — never a cross join
    p = plan_of(qs["benchmark_rl_pairs"](spark, SF))
    ok &= check("no_cartesian_in_benchmark", "CartesianProduct" not in p)

    # simhash is pure codegen since round 3 (md5-derived hashes + 64
    # vote aggregates): no Python evaluator of any kind in the plan
    p = plan_of(qs["simhash_dedup"](spark, SF))
    ok &= check(
        "simhash_no_python",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p and "CartesianProduct" not in p,
    )

    # salted join: a real equi-join whose keys INCLUDE the salt (so a
    # hot key spreads across reducers when the join shuffles; at sf0.01
    # AQE broadcasts the tiny dim, which is also correct), compact-side
    # replication via JVM-side explode — no cartesian, no python
    p = plan_of(qs["j6_salted_join"](spark, SF))
    join_line = next((ln for ln in p.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln), "")
    ok &= check(
        "salted_join_shape",
        "_salt" in join_line
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p,
    )

    # sessionize: ONE shuffle on user_id feeds both windows (lag +
    # gap-cumsum share the partitioning) and the groupBy reuses it —
    # a second Exchange would mean the session assembly re-shuffles
    # 10^12 events for no reason
    p = plan_of(qs["sessionize"](spark, SF))
    n_exchange = sum(
        1 for ln in p.splitlines() if "Exchange" in ln and "Reused" not in ln
    )
    ok &= check(
        "sessionize_single_shuffle",
        n_exchange == 1 and "hashpartitioning(user_id" in p,
        f"(exchanges={n_exchange})",
    )

    print("ALL OK" if ok else "AUDIT FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
