"""Classify dedup_simhash output pairs at a scale corpus: same-replica
(planted, should scale linearly), cross-replica same base doc (generator
artifact if quadratic), or unrelated (random fingerprint collision)."""
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.dedup import (  # noqa: E402
    portable_token_hash,
    simhash_pairs,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.plans.extensions import (  # noqa: E402
    _docs_near_aug,
)

STRIDE = 10_000_000

if __name__ == "__main__":
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "96g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = sys.argv[1]
    pairs = simhash_pairs(
        _docs_near_aug(spark, sf_dir), "doc_id", "text",
        max_distance=3, num_bits=60, hasher=portable_token_hash,
    )
    cls = pairs.select(
        (F.col("a_id") % STRIDE).alias("af"),
        (F.col("b_id") % STRIDE).alias("bf"),
        ((F.col("a_id") / STRIDE).cast("long") ==
         (F.col("b_id") / STRIDE).cast("long")).alias("same_replica"),
        "hamming",
    ).withColumn(
        "same_base", (F.col("af") % 100_000) == (F.col("bf") % 100_000)
    )
    out = (cls.groupBy("same_replica", "same_base")
           .agg(F.count(F.lit(1)).alias("pairs"),
                F.round(F.avg("hamming"), 2).alias("avg_ham"))
           .collect())
    print(json.dumps([r.asDict() for r in out], indent=1))
    # top hot fingerprint families among cross-replica pairs: which base
    # docs drive them, and a sample text
    hot = (cls.filter(~F.col("same_replica") & F.col("same_base"))
           .groupBy((F.col("af") % 100_000).alias("base"))
           .agg(F.count(F.lit(1)).alias("pairs"))
           .orderBy(F.desc("pairs")).limit(10).collect())
    print(json.dumps([r.asDict() for r in hot], indent=1))
    bases = [r["base"] for r in hot[:3]]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for b in bases:
        row = docs.filter(F.col("doc_id") == b).select("text").head()
        if row:
            t = row["text"]
            print(f"base {b}: len={len(t)} words={len(t.split())} :: {t[:160]!r}")
