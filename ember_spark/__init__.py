"""ember_spark — a from-scratch PySpark-native entity-resolution engine.

Re-implements the query/data-processing capabilities of the reference
EMBer pipeline (tshu-w/ember, IJCAI 2022) as an idiomatic Spark
DataFrame pipeline: blocking -> pairwise scoring -> transitive
clustering, plus the dedup / similarity-search / text-analysis
operators a large-scale training-data pipeline needs.

Design stance (SURVEY.md §7.0): pure ``pyspark.sql`` + Arrow pandas
UDFs; no RDDs, no per-row Python UDFs, no GraphFrames. Every stage is
DataFrame -> DataFrame with explicit schemas and explicit partitioning.
"""

__version__ = "0.1.0"
