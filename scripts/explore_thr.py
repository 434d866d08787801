"""Pick the pinned-jaccard decision boundary for the oracle-checkable
flagship query: pair counts, min boundary distance, component counts."""

import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ember_spark.session import get_spark
from ember_spark.plans.pipeline import ERPipeline
from ember_spark.operators.clustering import connected_components

def main(sf_dir="/root/testdata/sf0.01"):
    spark = get_spark("explore_thr", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    pipe = ERPipeline(spark)
    prepared = pipe.prepare(docs, slim=False).persist()
    pairs = pipe.block(prepared)
    toks = prepared.select("rid", F.array_distinct("tokens").alias("tk"))
    j = (
        pairs.join(toks.select(F.col("rid").alias("id_l"), F.col("tk").alias("tl")), "id_l")
        .join(toks.select(F.col("rid").alias("id_r"), F.col("tk").alias("tr")), "id_r")
        .withColumn("inter", F.size(F.array_intersect("tl", "tr")))
        .withColumn("uni", F.size(F.array_union("tl", "tr")))
        .withColumn("jac", F.when(F.col("uni") == 0, 1.0).otherwise(F.col("inter") / F.col("uni")))
        .select("id_l", "id_r", "jac")
        .persist()
    )
    for thr in [0.4565, 0.5565, 0.6565, 0.7565, 0.8565]:
        e = j.filter(F.col("jac") >= thr)
        cnt = e.count()
        mind = j.agg(F.min(F.abs(F.col("jac") - thr))).first()[0]
        comp = connected_components(e, "id_l", "id_r")
        ncomp = comp.select("component").distinct().count()
        biggest = comp.groupBy("component").count().agg(F.max("count")).first()[0]
        print(f"thr={thr}: edges={cnt} min|jac-thr|={mind:.6g} "
              f"components(non-singleton-nodes)={ncomp} biggest={biggest}")

if __name__ == "__main__":
    main(*sys.argv[1:])
