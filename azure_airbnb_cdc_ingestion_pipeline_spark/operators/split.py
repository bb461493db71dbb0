"""Conditional split (disjoint) — the reference's data-quality gate.

Reference: ``split(check_out_date < check_in_date, disjoint: true)
~> dataQualityCheck@(BadRecords, AcceptedRecords)``
(/root/reference/dataflow/BookingDataTransformation.json:96-97).

Semantics locked by test: predicate-TRUE rows route to the FIRST stream
(BadRecords); everything else — predicate false OR null — routes to the
second. Disjoint ⟹ the two outputs exhaustively partition the input.

Spark-first: two complementary filters over the same scan. Catalyst pushes
both predicates to the source; with one upstream ``.cache()`` (caller's
choice) the scan is shared. No shuffle — this is a narrow op at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def conditional_split(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """Return ``(matched, rest)``: rows where ``predicate`` is TRUE, and all
    remaining rows (false or null) — an exhaustive disjoint partition."""
    matched = df.filter(predicate)
    rest = df.filter(~predicate | predicate.isNull())
    return matched, rest
