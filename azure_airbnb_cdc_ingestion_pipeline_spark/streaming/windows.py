"""Event-time windowed aggregation: tumbling / sliding / session.

Charter extension (the reference has NO windows or watermarks —
SURVEY.md §2.7: its late-data story is keyed-upsert-latest-wins). These
wrappers work identically on batch and streaming DataFrames because
`F.window` / `F.session_window` are plain grouping expressions; for
streams add `with_watermark` so state can be evicted.

Scale posture: a windowed aggregation shuffles on (key, window) — the
window id multiplies key cardinality, keeping partitions fine-grained;
sliding windows fan each row out duration/slide times (cost is explicit
and linear); session windows keep per-key state until the gap closes,
bounded by the watermark.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound: rows older than max(event time) - delay are
    dropped and window state below it is finalized/evicted."""
    return df.withWatermark(ts_col, delay)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Non-overlapping fixed windows (epoch-aligned)."""
    return (
        df.groupBy(F.window(ts_col, duration), *keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "*",
        )
        .drop("window")
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows."""
    return (
        df.groupBy(F.window(ts_col, duration, slide), *keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "*",
        )
        .drop("window")
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Data-driven windows: a session extends while successive events per
    key arrive within `gap`; window end = last event + gap."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "*",
        )
        .drop("session_window")
    )
