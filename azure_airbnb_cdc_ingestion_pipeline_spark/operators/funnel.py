"""Ordered-funnel and cohort-retention analytics over an event stream.

Product-analytics operators the reference's event pipeline implies but
never materializes (the Cosmos change feed carries booking lifecycle
events; reference spec: mock_data_in_cosmosdb.py:20-43 emits typed
events per entity): stage-ordered conversion funnels and week-cohort
retention grids — the two queries every event warehouse runs first.

Scale posture (100 TB events):

- ``funnel``: one hash exchange on the user key, then STACKED window
  operators over the same partitioning (Catalyst plans one exchange +
  one sort, k window nodes). No per-user array materialization — a
  hot user with 10^8 events costs a wider sort run, not executor
  memory (the ``collect_list``-then-fold formulation would OOM on
  skewed users; the window formulation spills).
- ``cohort_retention``: (user, week) dedup exchange, then a window min
  over user (already hash-partitioned compatibly after the dedup's
  grouping), then a counts-only final aggregate. No distinct-count
  expand: after the (user, week) dedup every row IS one active
  (user, week), so a plain ``count`` is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Strictly-ordered conversion funnel.

    A user converts through stage k when an event of type ``stages[k]``
    exists with timestamp STRICTLY after their stage-(k-1) conversion
    time (first-touch semantics: each stage binds to its earliest
    eligible event). With ``max_gap_seconds`` the stage-k event must
    additionally land within that many seconds of the bound stage-(k-1)
    event (the windowed funnel every product-analytics store offers —
    conversions outside the window don't count). Returns one row per
    stage: ``(stage_idx, stage, users, conv_pct)`` where ``conv_pct``
    is percent of stage-1 users surviving to stage k (rounded to 6 dp —
    an exact integer ratio, so the rounding is deterministic).
    """
    if not stages:
        raise ValueError("funnel requires at least one stage")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: Column | None = None
    t_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
            if max_gap_seconds is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= prev + F.expr(f"INTERVAL {max_gap_seconds} SECOND")
                )
        name = f"__t{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        t_cols.append(name)
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in t_cols]
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"__c{i}") for i, c in enumerate(t_cols)]
    )
    rows = [
        F.struct(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col(f"__c{i}").alias("users"),
            F.round(F.col(f"__c{i}") * 100.0 / F.col("__c0"), 6).alias(
                "conv_pct"
            ),
        )
        for i, stage in enumerate(stages)
    ]
    return counts.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.stage_idx", "r.stage", "r.users", "r.conv_pct")


def top_paths(
    events: DataFrame,
    n_steps: int = 5,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k most common event paths: each user's first ``n_steps``
    event types (ordered by ``(ts, tiebreak)`` — a total order, so the
    path string is deterministic) joined with '>', counted across
    users. Returns ``(path, users)``, the ``top_k`` by
    ``(users DESC, path)`` — a total order, so the cut is exact.

    Scale: one exchange on the user key for the ranking window, a
    per-user fold into a single short string, a small path-keyed
    aggregate, and a TakeOrdered top-k (heap — no global sort)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    firstn = (
        events.select(user_col, type_col, ts_col, tiebreak_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_steps)
    )
    paths = firstn.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__rn"), F.col(type_col)))
                ),
                lambda s: s[type_col],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy(F.desc("users"), "path")
        .limit(top_k)
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort-retention grid.

    Cohort = ISO week (Monday-truncated) of the user's first event;
    a user is retained at offset k when they have any event in cohort
    week + k. Returns ``(cohort_week, week_offset, active_users)`` —
    all integers/timestamps, hash-exact against the SQL oracle.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    uw = events.select(
        F.col(user_col).alias("u"), wk.alias("wk")
    ).distinct()
    uw = uw.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("u"))
    )
    out = (
        uw.groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    if max_offset is not None:
        out = out.filter(F.col("week_offset") <= max_offset)
    return out
