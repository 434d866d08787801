"""Sinks (SURVEY.md §2.1 S3/S5): parquet by default; Iceberg when the
runtime catalog is on the classpath (same call shape, table semantics
preserved — SURVEY.md §7.3 'Iceberg in sandbox').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True only when the Iceberg runtime is on the classpath AND at
    least one Iceberg catalog is configured. The classpath check alone
    is not enough: with the jar present but no spark.sql.catalog.*
    configuration, writeTo(name) resolves against the default
    non-Iceberg catalog and raises — and the parquet fallback this
    gate exists to provide would never engage."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    try:
        it = spark.sparkContext._jsc.sc().conf().getAll()
        for kv in it:
            k, v = kv._1(), kv._2()
            if k.startswith("spark.sql.catalog.") and "iceberg" in v.lower():
                return True
    except Exception:
        pass
    try:
        # catalogs registered AFTER startup (spark.conf.set) live in the
        # session's RuntimeConfig, not the SparkContext conf — checking
        # only the latter made the gate miss them and silently divert
        # writes to a parquet directory named like the table
        entries = spark._jsparkSession.conf().getAll()
        jit = entries.iterator()
        while jit.hasNext():
            kv = jit.next()
            k, v = kv._1(), str(kv._2())
            if k.startswith("spark.sql.catalog.") and "iceberg" in v.lower():
                return True
    except Exception:
        pass
    return False


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink, mirroring write_parquet (Spark-native, zlib-compressed
    by default; no extra jar)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (reference op S5, the parquet->CSV round-trip for
    DeepMatcher, `scripts/dm.py:262-266`). Not on the hot path."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_table(df: DataFrame, name_or_path: str, mode: str = "overwrite") -> None:
    """Iceberg `writeTo(...)` when available, else a parquet directory
    with identical layout (the driver oracle reads parquet either way).

    `mode` is honored on BOTH paths — all four DataFrameWriter modes,
    not just append/overwrite: mapping 'error'/'ignore' to
    createOrReplace would silently DESTROY existing table data on the
    Iceberg path while the parquet path protected it — the worst kind
    of environment-dependent divergence."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in name_or_path:
        if mode == "append":
            df.writeTo(name_or_path).append()
        elif mode == "overwrite":
            df.writeTo(name_or_path).createOrReplace()
        elif mode in ("error", "errorifexists"):
            df.writeTo(name_or_path).create()  # raises if the table exists
        elif mode == "ignore":
            if not spark.catalog.tableExists(name_or_path):
                df.writeTo(name_or_path).create()
        else:
            raise ValueError(f"write_table: unknown mode {mode!r}")
    else:
        write_parquet(df, name_or_path, mode=mode)
