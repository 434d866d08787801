from ember_spark.sources.readers import (  # noqa: F401
    read_csv_multichar_delim,
    read_jsonl,
    read_parquet,
    read_binary_files,
)
from ember_spark.sources.writers import write_parquet, write_table  # noqa: F401
