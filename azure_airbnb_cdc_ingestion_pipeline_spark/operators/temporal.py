"""Temporal joins: as-of (nearest-prior-event) and interval (range) joins.

Charter extension — the classic operators Spark lacks natively, built as
compositions of DataFrame ops (no UDF, no custom physical operator):

- **asof_join**: for each left row, attach the latest right row with
  right_ts <= left_ts per key. Implemented with the union + sort +
  last-non-null-carry-forward trick: tag both sides, union, one window
  over (key, ts) carrying the right payload forward, keep left rows.
  ONE shuffle on the key — never a per-row range probe, never an
  inequality join. This is the formulation that scales: cost is
  sort-within-partition of |L|+|R|, the same asymptotics as a merge join.
- **interval_join**: equi-join on the key plus a time-range predicate
  pushed into the join condition. Catalyst plans the equi part as a
  hash/sort-merge join and applies the range as a join filter, so the
  work per key-group is |L_k| x |R_k| only within the key — acceptable
  when keys are high-cardinality (events per user), the common case.

Both deterministic under ties via explicit tiebreak ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of-backward join (inclusive): each left row gains the
    payload of the latest right row with right_ts <= left_ts for the same
    `on` key; null payload when no prior right row exists.

    Equivalent SQL: ``l ASOF LEFT JOIN r ON l.key = r.key AND l.ts >= r.ts``.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = left.columns
    # The payload travels as ONE struct so the attached values always come
    # from a single right row (per-column carry could stitch columns from
    # different rows when some payload values are null).
    from pyspark.sql.types import StructField, StructType

    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_payload]
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in right_payload]).alias("__r"),
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal ts (__is_left asc) so an
    # exactly-simultaneous right row is visible to the left row (inclusive);
    # equal-(key, ts) right rows tiebreak on the payload struct itself
    # (field-wise comparison), so the carried row — the sort-last one, i.e.
    # the greatest payload tuple — is deterministic run-to-run.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__is_left"), F.asc("__r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__r_carried")
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *lcols,
        *[
            F.col("__r_carried")[c].alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL '0' SECOND",
    upper: str = "INTERVAL '1' HOUR",
) -> DataFrame:
    """Inner join of rows sharing `on` whose timestamps satisfy
    left_ts - upper <= right_ts <= left_ts - lower (i.e. the right event
    happened within (lower, upper] BEFORE the left event)."""
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rt <= lt - F.expr(lower))
        & (rt >= lt - F.expr(upper))
    )
    return left.alias("l").join(right.alias("r"), cond, "inner")
