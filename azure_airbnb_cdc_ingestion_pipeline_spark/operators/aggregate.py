"""Gold-layer aggregation — the reference's star join + group-by.

Reference: ``SELECT c.country, COUNT_BIG(*) AS total_bookings,
SUM(ISNULL(b.amount,0)) AS total_amount, MAX(b.booking_date) AS
last_booking_date FROM bookings_fact b JOIN customer_dim c ON
b.customer_id = c.customer_id GROUP BY c.country``
(/root/reference/synapse_table_creation.sql:59-69, stored-proc body :76-87).

Spark-first: broadcast the dim (it is the small side of a star join),
group-by on the dim attribute. The aggregation is partial (map-side
combine) then final — one shuffle on ``country``. ``F.count`` already
returns bigint (COUNT_BIG parity).

Scale: fact⋈dim with dim broadcast = zero shuffle of the 100 TB fact for
the join; the only shuffle is the low-cardinality group-by, which AQE
coalesces. The full-refresh materialization (truncate+insert,
synapse_table_creation.sql:71-88) maps to an atomic table overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gold_booking_aggregation(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str = "customer_id",
    dim_key: str = "customer_id",
    group_col: str = "country",
    amount_col: str = "amount",
    date_col: str = "booking_date",
    broadcast_dim: bool = True,
) -> DataFrame:
    # namespace the dim columns — the fact may carry same-named attributes
    # (e.g. its own denormalized `country`)
    dim_side = dim.select(
        F.col(dim_key).alias("__k"), F.col(group_col).alias("__grp")
    )
    if broadcast_dim:
        dim_side = F.broadcast(dim_side)
    joined = fact.join(dim_side, fact[fact_key] == dim_side["__k"], "inner")
    return joined.groupBy(F.col("__grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("total_bookings"),
        F.sum(F.coalesce(F.col(amount_col), F.lit(0.0))).alias("total_amount"),
        F.max(date_col).alias("last_booking_date"),
    )


def full_refresh(result: DataFrame, table) -> None:
    """Truncate+insert parity: atomically replace the gold table with the
    freshly computed aggregate (ParquetTable.overwrite is the atomic
    analog of the stored proc's TRUNCATE + INSERT)."""
    table.overwrite(result)
