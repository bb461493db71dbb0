"""AirBnBCDCPipeline — top-level orchestration (control plane).

Reference: /root/reference/pipeline/AirBnBCDCPipeline.json:5-43 — run
LoadCustomerDim, wait, on Succeeded run LoadBookingFact (dim-before-fact
referential ordering); per-activity retry policy
(/root/reference/pipeline/LoadBookingFact.json:10-12, README.md:654-665:
bounded retries with interval).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

from ..sources.tables import ParquetTable
from .load_booking_fact import load_booking_fact_stream
from .load_customer_dim import load_customer_dim

log = logging.getLogger(__name__)


def with_retry(fn: Callable, retries: int = 3, interval_s: float = 30.0):
    """Bounded-retry activity policy. Defaults mirror the reference's
    activity policy — 30 s retryIntervalInSeconds
    (/root/reference/pipeline/LoadBookingFact.json:10-12) and the README's
    3-retry guidance; callers (and tests) override interval_s."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:  # noqa: BLE001
            attempt += 1
            if attempt > retries:
                raise
            log.warning("activity failed (attempt %d/%d), retrying", attempt, retries)
            time.sleep(interval_s)


def run_cdc_pipeline(
    spark: SparkSession,
    customer_raw_dir: str,
    customer_archive_dir: str,
    booking_landing_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    retries: int = 3,
    retry_interval_s: float = 30.0,
) -> dict[str, ParquetTable]:
    """Dim load, then fact load + gold rebuild — failure of the dim stage
    blocks the fact stage (dependencyConditions: Succeeded)."""
    dim = ParquetTable(spark, f"{warehouse_dir}/customer_dim")
    fact = ParquetTable(spark, f"{warehouse_dir}/bookings_fact")
    quarantine = ParquetTable(spark, f"{warehouse_dir}/rejected_bookings")
    gold = ParquetTable(spark, f"{warehouse_dir}/booking_customer_aggregation")

    with_retry(
        lambda: load_customer_dim(spark, customer_raw_dir, dim, customer_archive_dir),
        retries=retries,
        interval_s=retry_interval_s,
    )
    with_retry(
        lambda: load_booking_fact_stream(
            spark,
            booking_landing_dir,
            fact,
            quarantine,
            checkpoint_dir,
            dim=dim.read() if dim.exists() else None,
            gold=gold,
        ),
        retries=retries,
        interval_s=retry_interval_s,
    )
    return {"dim": dim, "fact": fact, "quarantine": quarantine, "gold": gold}
