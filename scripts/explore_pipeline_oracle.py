"""One-off exploration: can the ER pipeline's predicted edge set at
sf0.01/sf0.001 be characterized by an SQL-expressible condition
(token jaccard threshold) with a wide margin?  Feeds the design of the
er_pipeline_entities DuckDB oracle."""

import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ember_spark.session import get_spark
from ember_spark.plans.pipeline import ERPipeline

def main(sf_dir="/root/testdata/sf0.01"):
    spark = get_spark("explore_oracle", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    pipe = ERPipeline(spark)
    prepared = pipe.prepare(docs, slim=False).persist()
    n = prepared.count()
    print(f"docs: {n}")
    pairs = pipe.block(prepared)
    print(f"candidate pairs: {pairs.count()}  (all-pairs would be {n*(n-1)//2})")
    scored = pipe.score(pairs, prepared).persist()
    sc = scored.count()
    pos = scored.filter(F.col("prediction") == 1)
    print(f"scored: {sc}, predicted=1: {pos.count()}")

    # brute-force token jaccard on raw tokens for every candidate pair
    toks = prepared.select(F.col("rid"), F.col("tokens"))
    j = (
        scored.join(toks.select(F.col("rid").alias("id_l"), F.col("tokens").alias("tk_l")), "id_l")
        .join(toks.select(F.col("rid").alias("id_r"), F.col("tokens").alias("tk_r")), "id_r")
        .withColumn("tl", F.array_distinct("tk_l"))
        .withColumn("tr", F.array_distinct("tk_r"))
        .withColumn("inter", F.size(F.array_intersect("tl", "tr")))
        .withColumn("uni", F.size(F.array_union("tl", "tr")))
        .withColumn("jac", F.when(F.col("uni") == 0, 1.0).otherwise(F.col("inter") / F.col("uni")))
        .select("id_l", "id_r", "score", "prediction", "jac",
                "f_jaccard", "f_containment", "f_jw", "f_cos", "f_len_ratio")
        .persist()
    )
    print("\n-- prediction=1: min/max raw-token jaccard, score --")
    j.filter("prediction = 1").agg(
        F.min("jac"), F.max("jac"), F.min("score"), F.count("*")
    ).show(truncate=False)
    print("-- prediction=0: max raw-token jaccard, max score --")
    j.filter("prediction = 0").agg(
        F.max("jac"), F.max("score"), F.count("*")
    ).show(truncate=False)
    print("-- distribution of jac: predicted=0 top 10 by jac --")
    j.filter("prediction = 0").orderBy(F.desc("jac")).show(10, truncate=False)
    print("-- predicted=1 bottom 10 by jac --")
    j.filter("prediction = 1").orderBy("jac").show(10, truncate=False)

    # does f_jaccard (hashed tokens) == jac (raw tokens) everywhere?
    mism = j.withColumn("d", F.abs(F.col("f_jaccard") - F.col("jac"))).filter("d > 1e-9")
    print(f"hashed-vs-raw jaccard mismatches: {mism.count()}")
    mism.show(5, truncate=False)

if __name__ == "__main__":
    main(*sys.argv[1:])
