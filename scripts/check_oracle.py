"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compare row count + column names + order-insensitive
values (floats rounded to 9dp before comparing)."""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

from ember_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    rows = [tuple(None if (isinstance(v, float) and math.isnan(v)) else v for v in r)
            for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        # dtype-kind mismatch (e.g. DuckDB HUGEINT->float64 vs Spark int64)
        # hash-mismatches in the driver even when the values are identical.
        kind_diffs = [
            (c, sdf[c].dtype.kind, odf[c].dtype.kind)
            for c in sorted(sdf.columns)
            if sdf[c].dtype.kind != odf[c].dtype.kind
            and {sdf[c].dtype.kind, odf[c].dtype.kind} <= {"i", "u", "f"}
        ]
        if kind_diffs:
            failures.append((name, f"dtype kinds differ: {kind_diffs}"))
            print(f"FAIL {name}: dtype kinds differ (spark vs oracle): {kind_diffs}")
            continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            continue
        print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
