"""Connected-components correctness on crafted graphs (SURVEY.md §5),
checked against a pure-Python union-find oracle."""

import random

import pandas as pd
from pyspark.sql import functions as F

from ember_spark.operators.clustering import connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id representative
    return {x: find(x) for x in parent}


def _run_cc(spark, edges):
    """Every crafted graph checks BOTH execution paths against the
    oracle: the small-graph local union-find (the default at this size)
    and the distributed star loop (forced via local_threshold=0)."""
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_l", "id_r"]), "id_l long, id_r long"
    )
    exp = _uf_oracle(edges)
    got_local = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got_local == exp, f"local: got={got_local} exp={exp}"
    got_dist = {
        r["id"]: r["component"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got_dist == exp, f"distributed: got={got_dist} exp={exp}"


def test_cc_chain(spark):
    _run_cc(spark, [(i, i + 1) for i in range(12)])


def test_cc_star(spark):
    _run_cc(spark, [(50, i) for i in range(10)])


def test_cc_two_cliques_bridge(spark):
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _run_cc(spark, c1 + c2 + [(4, 10)])


def test_cc_self_loops_and_duplicates(spark):
    _run_cc(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3), (4, 5)])


def test_cc_random_graph_vs_oracle(spark):
    rng = random.Random(142)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    _run_cc(spark, edges)


def test_cc_string_ids(spark):
    edges = [("u-a", "u-b"), ("u-b", "u-c"), ("u-x", "u-y")]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_l", "id_r"]), "id_l string, id_r string"
    )
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"u-a": "u-a", "u-b": "u-a", "u-c": "u-a", "u-x": "u-x", "u-y": "u-x"}


def test_cc_string_ids_both_paths(spark):
    edges = [("u-a", "u-b"), ("u-b", "u-c"), ("u-x", "u-y")]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_l", "id_r"]), "id_l string, id_r string"
    )
    want = {"u-a": "u-a", "u-b": "u-a", "u-c": "u-a", "u-x": "u-x", "u-y": "u-x"}
    for thr in (500_000, 0):
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, local_threshold=thr).collect()
        }
        assert got == want, thr


def test_cc_empty_edges_both_paths(spark):
    df = spark.createDataFrame(
        pd.DataFrame(columns=["id_l", "id_r"]), "id_l long, id_r long"
    )
    for thr in (500_000, 0):
        assert connected_components(df, local_threshold=thr).count() == 0, thr


def test_cc_local_path_equals_distributed_property(spark):
    """Randomized equivalence: on arbitrary graphs (dup edges, self
    loops, chains crossing component minima) the local union-find and
    the distributed star loop return the identical (id, component)
    set."""
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randrange(5, 120)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(1, 200))
        ]
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["id_l", "id_r"]), "id_l long, id_r long"
        )
        local = sorted(map(tuple, connected_components(df).collect()))
        dist = sorted(
            map(tuple, connected_components(df, local_threshold=0).collect())
        )
        assert local == dist, (trial, edges)
