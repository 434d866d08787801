"""Sources (SURVEY.md §2.1).

- S1: multi-char-delimiter CSV — the reference reads its raw dump with
  `pd.read_csv(sep="@;@")` (`build_ali_corpus.py:16-22`); Spark's csv
  source is single-char, so: `spark.read.text` + one `split` + select.
- S2: parquet with explicit schema (never inferSchema on the hot path).
- S4: JSON-lines (gzip transparent) with explicit schema + column
  pruning at the source (S7) via .select.
- S6: directory listing as a table via the binaryFile source (image
  manifest analog of `glob("*.jpg")`, `build_ali_corpus.py:23`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv_multichar_delim(
    spark: SparkSession,
    path: str,
    delimiter: str,
    column_names: list[str],
) -> DataFrame:
    """CSV scan with a multi-character delimiter (op S1).

    `split` with a regex-quoted pattern and a limit, so delimiter chars
    inside the last field survive. All columns come back as strings —
    cast downstream with an explicit schema.
    """
    import re

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), re.escape(delimiter), len(column_names))
    # F.get, not getItem: under Spark 4's default ANSI mode an
    # out-of-bounds getItem ABORTS the scan (INVALID_ARRAY_INDEX), so
    # one truncated/blank line in a raw dump killed the whole read;
    # get() null-pads short rows — the CSV semantics a raw web dump
    # needs and what the docstring promises
    return lines.select(
        *[F.get(parts, i).alias(name) for i, name in enumerate(column_names)]
    )


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan (S2) with optional source-level pruning (S7)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan with optional source-level pruning — the other
    columnar lake format Spark ships a native vectorized reader for
    (no extra jar, unlike Avro/Iceberg). Same pushdown/pruning
    behavior as the parquet path: predicates and the column list reach
    the scan node."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    drop_columns: list[str] | None = None,
) -> DataFrame:
    """JSON-lines scan (S4; .gz transparent). The reference drops nested
    struct columns it can't cast (`wdcdatamodule.py:64-73`) — pass them
    via drop_columns (Catalyst prunes them out of the parse)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return df.drop(*drop_columns) if drop_columns else df


def read_binary_files(spark: SparkSession, path: str, pattern: str = "*") -> DataFrame:
    """Directory listing as a table (S6): (path, modificationTime,
    length, content) via the binaryFile source."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
