"""One-off diagnostic for the sf100 dedup_simhash superlinear flag
(SCALE_r06_sf100.json: 13.32x for 10x docs).

For each sf dir: count augmented docs, simhash-block-join CANDIDATE rows
(post chunk-key join, pre Hamming filter), and final output pairs. Row
growth >> k means the workload (generator) is quadratic; ~k means the
engine plan itself is superlinear in wall time only.
"""
import itertools
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.dedup import (  # noqa: E402
    portable_token_hash,
    simhash,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.plans.extensions import (  # noqa: E402
    _docs_near_aug,
)


def diag(spark, sf_dir, max_distance=3, num_bits=60):
    out = {"sf_dir": sf_dir}
    df = _docs_near_aug(spark, sf_dir)
    t0 = time.time()
    sh = simhash(df, "doc_id", "text", num_bits=num_bits,
                 hasher=portable_token_hash).persist()
    n = sh.count()
    out["docs"] = n
    out["simhash_build_sec"] = round(time.time() - t0, 1)

    # replicate simhash_pairs' adaptive blocking
    c, g = (6, 3) if n > 30_000 else (max_distance + 1, 1)
    base_w, rem = num_bits // c, num_bits % c
    widths = [base_w + (1 if i < rem else 0) for i in range(c)]
    offsets = [sum(widths[:i]) for i in range(c)]

    def chunk_val(i):
        mask = -1 if widths[i] >= 64 else (1 << widths[i]) - 1
        return F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(
            F.lit(mask).cast("long"))

    structs = []
    for ci, combo in enumerate(itertools.combinations(range(c), g)):
        packed, shift = F.lit(0).cast("long"), 0
        for i in combo:
            packed = packed + F.shiftleft(chunk_val(i), shift)
            shift += widths[i]
        structs.append(F.struct(F.lit(ci).alias("ci"), packed.alias("cv")))
    blocked = sh.select(
        "id", "simhash", F.explode(F.array(*structs)).alias("c")
    ).select("id", "simhash", "c.ci", "c.cv").persist()
    blocked.count()

    # block-key occupancy: candidate join rows = sum over keys of C(m,2)
    t0 = time.time()
    occ = (blocked.groupBy("ci", "cv").count()
           .agg(F.sum(F.expr("count*(count-1)/2")).alias("cand"),
                F.max("count").alias("max_key"),
                F.count(F.lit(1)).alias("n_keys")).collect()[0])
    out["candidate_pairs"] = int(occ["cand"] or 0)
    out["max_block_key_rows"] = int(occ["max_key"] or 0)
    out["distinct_block_keys"] = int(occ["n_keys"] or 0)
    out["occupancy_scan_sec"] = round(time.time() - t0, 1)

    # final pairs (the query's own path)
    a = blocked.select(F.col("id").alias("a_id"),
                       F.col("simhash").alias("fa"), "ci", "cv")
    b = blocked.select(F.col("id").alias("b_id"),
                       F.col("simhash").alias("fb"), "ci", "cv")
    t0 = time.time()
    pairs = (a.join(b, ["ci", "cv"])
             .filter(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id",
                     F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("h"))
             .filter(F.col("h") <= max_distance)
             .dropDuplicates(["a_id", "b_id"]))
    out["output_pairs"] = pairs.count()
    out["join_sec"] = round(time.time() - t0, 1)
    sh.unpersist()
    blocked.unpersist()
    return out


if __name__ == "__main__":
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "96g")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    res = [diag(spark, d) for d in sys.argv[1:]]
    print(json.dumps(res, indent=1))
