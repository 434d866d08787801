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
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_l", "id_r"]), "id_l long, id_r long"
    )
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    exp = _uf_oracle(edges)
    assert got == exp, f"got={got} exp={exp}"


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
