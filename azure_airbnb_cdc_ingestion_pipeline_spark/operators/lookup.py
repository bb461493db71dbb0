"""Lookup join — left-outer equi-join with keep-latest-per-key dedupe.

Reference: ``lookup(DerivedColumns@booking_id == SynapseLookUp@booking_id,
multiple:false, pickup:'first', desc(SynapseLookUp@timestamp, true),
broadcast:'auto')`` (/root/reference/dataflow/BookingDataTransformation.json:115-119):
left outer join on the key, and when the lookup side has multiple rows per
key, join only the latest (sorted DESC by timestamp, nulls last). Unmatched
left rows get nulls.

Spark-first plan: dedupe-then-join —
``row_number() over (partition by key order by ts desc)`` filter rn=1 on the
lookup side, then a left join. ``broadcast='auto'`` leaves strategy choice
to AQE/autoBroadcastJoinThreshold (the reference's own default);
``broadcast=True`` forces ``F.broadcast`` for known-small lookup sides
(<10 MB guidance, /root/reference/README.md:595-599).

Scale: the dedupe shuffles the lookup side once on the key; the join then
reuses that hash partitioning (Catalyst sees compatible distribution), or
skips the lookup-side shuffle entirely when broadcast. Never dedupe AFTER
the join — that would shuffle the big left side too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import topk_per_group


def lookup_latest(
    left: DataFrame,
    lookup: DataFrame,
    on: str | Sequence[str],
    order_by: Sequence[str | Column],
    broadcast: bool = False,
    how: str = "left",
) -> DataFrame:
    """Left-outer join ``left`` to the latest-per-key row of ``lookup``.

    Lookup-side columns that collide with left-side names are suffixed
    ``_lkp`` (the reference keeps both namespaces and collapses later in
    its select stage; suffixing is the DataFrame-native equivalent).
    """
    keys = [on] if isinstance(on, str) else list(on)
    latest = topk_per_group(lookup, keys, order_by, k=1, descending=True)
    clashes = (set(left.columns) & set(latest.columns)) - set(keys)
    for c in clashes:
        latest = latest.withColumnRenamed(c, f"{c}_lkp")
    right = F.broadcast(latest) if broadcast else latest
    return left.join(right, on=keys, how=how)
