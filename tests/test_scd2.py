"""SCD Type 2 apply + keyed reconciliation (operators/merge.py).

The reference's dim load is Type 1 — overwrite in place
(pipeline/LoadCustomerDim.json:82-101); scd2_apply is the engine's
history-keeping extension and reconcile is the CDC audit over a
replayed table. Covered contracts: no-op collapse, multi-change
ordering, untouched-key passthrough, idempotent re-apply, and the four
reconcile statuses.
"""

import datetime as dt

from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.merge import (
    reconcile,
    scd2_apply,
)

_D = dt.date


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, effective_from date, effective_to date, "
        "is_current boolean"
    )


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string, effective_from date")


def _apply(hist, chg):
    return scd2_apply(hist, chg, keys=["k"], attr_cols=["attr"])


def test_change_closes_prior_and_opens_new(spark):
    hist = _hist(spark, [(1, "a", _D(2024, 1, 1), None, True)])
    chg = _chg(spark, [(1, "b", _D(2024, 2, 1))])
    out = sorted(_apply(hist, chg).collect(), key=lambda r: r["effective_from"])
    assert [(r["attr"], r["effective_from"], r["effective_to"], r["is_current"])
            for r in out] == [
        ("a", _D(2024, 1, 1), _D(2024, 2, 1), False),
        ("b", _D(2024, 2, 1), None, True),
    ]


def test_noop_change_creates_no_version(spark):
    hist = _hist(spark, [(1, "a", _D(2024, 1, 1), None, True)])
    chg = _chg(spark, [(1, "a", _D(2024, 2, 1))])
    out = _apply(hist, chg).collect()
    assert len(out) == 1 and out[0]["is_current"]
    assert out[0]["effective_from"] == _D(2024, 1, 1)


def test_untouched_keys_pass_through_unrebuilt(spark):
    hist = _hist(
        spark,
        [
            (1, "a", _D(2024, 1, 1), None, True),
            (2, "x", _D(2023, 1, 1), _D(2023, 6, 1), False),
            (2, "y", _D(2023, 6, 1), None, True),
        ],
    )
    chg = _chg(spark, [(1, "b", _D(2024, 2, 1))])
    out = _apply(hist, chg)
    k2 = sorted(
        out.filter(F.col("k") == 2).collect(), key=lambda r: r["effective_from"]
    )
    assert [(r["attr"], r["effective_to"]) for r in k2] == [
        ("x", _D(2023, 6, 1)),
        ("y", None),
    ]
    assert out.filter(F.col("k") == 1).count() == 2


def test_two_changes_in_one_batch_order_by_timestamp(spark):
    hist = _hist(spark, [(1, "a", _D(2024, 1, 1), None, True)])
    chg = _chg(spark, [(1, "c", _D(2024, 3, 1)), (1, "b", _D(2024, 2, 1))])
    out = sorted(_apply(hist, chg).collect(), key=lambda r: r["effective_from"])
    assert [r["attr"] for r in out] == ["a", "b", "c"]
    assert [r["is_current"] for r in out] == [False, False, True]
    assert out[1]["effective_to"] == _D(2024, 3, 1)


def test_reapply_same_batch_is_idempotent(spark):
    hist = _hist(spark, [(1, "a", _D(2024, 1, 1), None, True)])
    chg = _chg(spark, [(1, "b", _D(2024, 2, 1))])
    once = _apply(hist, chg)
    twice = _apply(once, chg)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_reconcile_all_four_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    got = {r["k"]: r["status"] for r in reconcile(left, right, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "only_left", 4: "only_right"}


def test_reconcile_null_safe_compare(spark):
    left = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    right = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    got = {r["k"]: r["status"] for r in reconcile(left, right, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_out_of_order_wave_application_converges(spark):
    """Waves applied per-batch in ANY arrival order land on the same
    history as one-shot application: the rebuild orders by effective
    timestamp and collapses no-ops over the full sequence — the
    property the streaming coverage key (stream_scd2_coverage) relies
    on when triggers split the feed arbitrarily."""
    hist = _hist(spark, [(1, "a", _D(2024, 1, 1), None, True)])
    w1 = _chg(spark, [(1, "b", _D(2024, 2, 1))])
    w2 = _chg(spark, [(1, "c", _D(2024, 3, 1))])
    w3 = _chg(spark, [(1, "c", _D(2024, 4, 1))])  # no-op resend
    oneshot = _apply(hist, w1.unionByName(w2).unionByName(w3))
    ooo = hist
    for w in (w3, w1, w2):  # deliberately scrambled arrival
        ooo = _apply(ooo, w)
    assert sorted(map(tuple, oneshot.collect())) == sorted(
        map(tuple, ooo.collect())
    )


def test_empty_change_batch_is_identity(spark):
    hist = _hist(
        spark,
        [
            (1, "a", _D(2024, 1, 1), _D(2024, 2, 1), False),
            (1, "b", _D(2024, 2, 1), None, True),
        ],
    )
    empty = _chg(spark, []).limit(0)
    out = _apply(hist, empty)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, hist.collect())
    )


def test_reconcile_empty_right_all_only_left(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    right = spark.createDataFrame([], "k long, v string")
    got = {r["k"]: r["status"] for r in reconcile(left, right, ["k"]).collect()}
    assert got == {1: "only_left", 2: "only_left"}
