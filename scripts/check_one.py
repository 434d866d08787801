"""Check a subset of queries against their oracles (same comparison as
check_oracle.py, but only the names given on the command line)."""

import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

from scripts.check_oracle import TABLES, canon  # noqa: E402
from ember_spark.session import get_spark  # noqa: E402


def main(*names, sf_dir="/root/testdata/sf0.01"):
    spark = get_spark("oracle_check_one", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    bad = 0
    for name in names:
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        odf = con.execute(oracles[name]).df()
        kinds = [
            (c, sdf[c].dtype.kind, odf[c].dtype.kind)
            for c in sorted(sdf.columns)
            if c in odf.columns and sdf[c].dtype.kind != odf[c].dtype.kind
            and {sdf[c].dtype.kind, odf[c].dtype.kind} <= {"i", "u", "f"}
        ]
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_vals = ok_rows and ok_cols and canon(sdf) == canon(odf)
        status = "PASS" if (ok_rows and ok_cols and ok_vals and not kinds) else "FAIL"
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} cols_ok={ok_cols} "
              f"vals_ok={ok_vals} dtype_kind_diffs={kinds}")
        if status == "FAIL":
            bad += 1
            if ok_rows and ok_cols and not ok_vals:
                a, b = canon(sdf), canon(odf)
                print("  first diffs:", [(x, y) for x, y in zip(a, b) if x != y][:3])
    return bad


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
