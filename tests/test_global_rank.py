"""Distributed global rank / ntile (operators/windows.py::global_rank,
global_ntile): exactness vs the built-in single-partition ntile, and the
plan guarantee that no stage funnels all rows into one partition."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.windows import (
    global_ntile,
    global_rank,
)


def _df(spark, n=97):
    # non-trivial value distribution with a unique tiebreak id
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 37 % 11).alias("v"),
    )


def test_global_rank_matches_row_number(spark):
    df = _df(spark)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["v", "id"], num_partitions=7).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_builtin_allocation(spark):
    # 97 rows / 4 buckets: ANSI says buckets of 25,24,24,24
    df = _df(spark)
    got = {
        r["id"]: r["bucket"]
        for r in global_ntile(df, ["v", "id"], 4, num_partitions=5).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["nt"]
        for r in df.withColumn("nt", F.ntile(4).over(w)).collect()
    }
    assert got == want
    sizes = sorted(
        __import__("collections").Counter(got.values()).values(), reverse=True
    )
    assert sizes == [25, 24, 24, 24]


def test_global_ntile_fewer_rows_than_buckets(spark):
    df = _df(spark, n=3)
    got = sorted(
        r["bucket"] for r in global_ntile(df, ["v", "id"], 10).collect()
    )
    assert got == [1, 2, 3]  # ANSI: rank itself when n < buckets


def test_global_rank_no_single_partition_exchange(spark):
    """The whole point: the plan must contain a RANGE partitioning
    exchange and no SinglePartition exchange feeding the sort."""
    plan = (
        global_rank(_df(spark), ["v", "id"], num_partitions=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower(), plan
    assert "singlepartition" not in plan.lower(), plan
