"""Sequential funnel + cohort retention (operators/funnel.py)."""

import datetime as dt

import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.funnel import (
    cohort_retention,
    funnel,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, d, h)) for u, t, d, h in rows],
        "user_id long, event_type string, ts timestamp_ntz",
    )


def test_funnel_sequential_binds_later_event(spark):
    """A 'click' BEFORE signup must not convert stage 3 — but a later
    click must. This is the semantics the min-min formulation
    (event_funnel) gets wrong: min(click) < min(signup) there would
    drop the user even though a qualifying later click exists."""
    ev = _ev(
        spark,
        [
            (1, "click", 1, 0),   # pre-signup click: not eligible
            (1, "signup", 2, 0),
            (1, "view", 3, 0),
            (1, "click", 4, 0),   # eligible: strictly after view
            (2, "signup", 1, 0),
            (2, "view", 2, 0),
        ],
    )
    out = {
        r["stage"]: r
        for r in funnel(ev, ["signup", "view", "click"]).collect()
    }
    assert out["signup"]["users"] == 2
    assert out["view"]["users"] == 2
    assert out["click"]["users"] == 1
    assert out["click"]["conv_pct"] == 50.0


def test_funnel_strict_order_requires_increasing_ts(spark):
    # same-timestamp stage events do NOT chain (strictly-after contract)
    ev = _ev(spark, [(1, "signup", 1, 0), (1, "view", 1, 0)])
    out = {r["stage"]: r["users"] for r in funnel(ev, ["signup", "view"]).collect()}
    assert out == {"signup": 1, "view": 0}


def test_funnel_empty_stage_list_raises(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, []), [])


def test_cohort_retention_grid(spark):
    # user 1: first event Mon Jan 1 week, active weeks 0 and 2
    # user 2: first event week of Jan 8, active weeks 0 and 1
    ev = _ev(
        spark,
        [
            (1, "view", 2, 0),    # 2024-01-02 -> week of Jan 1
            (1, "view", 16, 0),   # week of Jan 15 = offset 2
            (2, "view", 9, 0),    # week of Jan 8
            (2, "view", 10, 5),   # same week, dedup
            (2, "view", 17, 0),   # week of Jan 15 = offset 1
        ],
    )
    rows = {
        (r["cohort_week"].date(), r["week_offset"]): r["active_users"]
        for r in cohort_retention(ev).collect()
    }
    assert rows == {
        (dt.date(2024, 1, 1), 0): 1,
        (dt.date(2024, 1, 1), 2): 1,
        (dt.date(2024, 1, 8), 0): 1,
        (dt.date(2024, 1, 8), 1): 1,
    }


def test_funnel_single_exchange_plan(spark):
    """The chained window formulation must plan ONE exchange on the user
    key for the window stack (stacked Window nodes, no per-stage
    re-shuffle)."""
    ev = _ev(spark, [(1, "signup", 1, 0), (1, "view", 2, 0)])
    plan = (
        funnel(ev, ["signup", "view", "click"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exchanges: one hashpartitioning(user_id) for window+groupBy reuse,
    # plus the final single-partition agg. No third data exchange.
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_funnel_windowed_gap_excludes_late_conversion(spark):
    """With a max gap, a stage event after the window must not count."""
    ev = _ev(
        spark,
        [
            (1, "signup", 1, 0),
            (1, "view", 1, 12),     # 12h later: inside a 1-day gap
            (2, "signup", 2, 0),
            (2, "view", 4, 0),      # 48h later: outside a 1-day gap
        ],
    )
    out = {
        r["stage"]: r["users"]
        for r in funnel(
            ev, ["signup", "view"], max_gap_seconds=86400
        ).collect()
    }
    assert out == {"signup": 2, "view": 1}


def test_top_paths_orders_and_cuts_deterministically(spark):
    from azure_airbnb_cdc_ingestion_pipeline_spark.operators.funnel import (
        top_paths,
    )

    rows = []
    eid = 0
    # 3 users with path a>b, 1 user with path b>a, 1 user with 1 event
    for u, seq in [(1, "ab"), (2, "ab"), (3, "ab"), (4, "ba"), (5, "a")]:
        for i, t in enumerate(seq):
            rows.append((u, t, 1 + i, eid % 24))
            eid += 1
    ev = spark.createDataFrame(
        [
            (u, t, __import__("datetime").datetime(2024, 1, d, h), i)
            for i, (u, t, d, h) in enumerate(rows)
        ],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    got = [(r["path"], r["users"]) for r in top_paths(ev, n_steps=5).collect()]
    assert got == [("a>b", 3), ("a", 1), ("b>a", 1)]
