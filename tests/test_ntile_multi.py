"""global_ntile_multi (r8, VERDICT r7 #5): the melted multi-metric exact
ntile must equal per-metric global_ntile (itself pinned to ANSI ntile)
on every metric, for uneven bucket allocations and negative/duplicate
values, while sharing one range pass."""

import pytest
from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.windows import (
    global_ntile,
    global_ntile_multi,
)


def _frame(spark, n=97):
    return spark.range(n).select(
        F.col("id").alias("uid"),
        (F.col("id") * 37 % 11).alias("m1"),          # heavy ties
        (-F.col("id") % 13).cast("double").alias("m2"),
        (F.col("id") * 7919 % 1000 / 3.0).alias("m3"),
    )


@pytest.mark.parametrize("n_buckets", [2, 4, 7])
def test_multi_equals_per_metric_global_ntile(spark, n_buckets):
    df = _frame(spark)
    multi = {
        r.uid: (r.b1, r.b2, r.b3)
        for r in global_ntile_multi(
            df, [("m1", "b1"), ("m2", "b2"), ("m3", "b3")],
            tie_cols=["uid"], n_buckets=n_buckets,
        ).collect()
    }
    singles = {}
    for i, m in enumerate(["m1", "m2", "m3"]):
        out = global_ntile(df, [m, "uid"], n_buckets, "b")
        for r in out.collect():
            singles.setdefault(r.uid, [None] * 3)[i] = r.b
    assert multi == {k: tuple(v) for k, v in singles.items()}


def test_multi_matches_builtin_ntile(spark):
    from pyspark.sql import Window

    df = _frame(spark, 41)
    w = Window.orderBy("m1", "uid")
    expect = {
        r.uid: r.q
        for r in df.withColumn("q", F.ntile(4).over(w)).collect()
    }
    got = {
        r.uid: r.q
        for r in global_ntile_multi(
            df, [("m1", "q")], tie_cols=["uid"], n_buckets=4
        ).collect()
    }
    assert got == expect


def test_multi_single_row_and_fewer_rows_than_buckets(spark):
    df = _frame(spark, 3)
    out = {
        r.uid: (r.a, r.b)
        for r in global_ntile_multi(
            df, [("m1", "a"), ("m2", "b")], tie_cols=["uid"], n_buckets=10
        ).collect()
    }
    assert len(out) == 3
    # with n < buckets, ANSI ntile assigns bucket = rank
    assert sorted(v[0] for v in out.values()) == [1, 2, 3]


def test_ntile_multi_driver_vs_distributed_parity(spark, monkeypatch):
    # r10: the driver ntile kernel must match the distributed
    # melt/range/offset pass row-for-row, including duplicate-tie rows
    import random

    import azure_airbnb_cdc_ingestion_pipeline_spark.operators.windows as W

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(0, 40), float(rng.randrange(0, 1000)) / 8)
        for i in range(257)
    ] + [(9999, 7, 1.5), (9999, 7, 1.5)]  # duplicated tie row
    df = spark.createDataFrame(rows, "uid bigint, freq bigint, spend double")
    metrics = [("freq", "f_q"), ("spend", "s_q")]
    fast = {
        tuple(r) for r in W.global_ntile_multi(df, metrics, ["uid"], 4).collect()
    }
    monkeypatch.setattr(W, "_NTILE_DRIVER_ROWS", 0)
    slow = {
        tuple(r) for r in W.global_ntile_multi(df, metrics, ["uid"], 4).collect()
    }
    assert fast == slow and len(fast) > 0
    # r11: driver_limit=0 must force the same distributed result without
    # the monkeypatch (the bench's forced-distributed leg contract)
    monkeypatch.undo()
    forced = {
        tuple(r)
        for r in W.global_ntile_multi(
            df, metrics, ["uid"], 4, driver_limit=0
        ).collect()
    }
    assert forced == slow


def test_ntile_multi_null_metric_falls_back_to_distributed(spark):
    # r11 (advisor): NULL metric values order differently in numpy (NaN
    # sorts last) than in Spark (NULL sorts first) — under-the-gate
    # inputs with nulls must yield the DISTRIBUTED path's buckets.
    rows = [(1, 10), (2, None), (3, 5), (4, None), (5, 7), (6, 1)]
    df = spark.createDataFrame(rows, "uid bigint, m bigint")
    got = {
        (r.uid, r.q)
        for r in global_ntile_multi(
            df, [("m", "q")], tie_cols=["uid"], n_buckets=3
        ).collect()
    }
    want = {
        (r.uid, r.q)
        for r in global_ntile_multi(
            df, [("m", "q")], tie_cols=["uid"], n_buckets=3, driver_limit=0
        ).collect()
    }
    assert got == want
    # NULLs sort FIRST ascending (Spark semantics): uids 2 and 4 are the
    # two lowest ranks -> bucket 1
    d = dict(got)
    assert d[2] == 1 and d[4] == 1
