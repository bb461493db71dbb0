"""CDC streaming-merge throughput bench.

BASELINE.md target: >= 1,000 events/s sustained through the
foreachBatch keyed merge (vs the reference's ~1,000 events/HOUR design
point, /root/reference/README.md:697-700).

Drives the real pipeline surface: JSON docs land in micro-batch files,
`load_booking_fact_stream` drains them with availableNow through
split -> derive -> keyed MERGE into the fact table. Prints one JSON line:
{"metric": "cdc_merge_throughput", "value": events_per_sec, ...}.

Usage: python tools/stream_bench.py [n_events] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.pipelines.load_booking_fact import (
    load_booking_fact_stream,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark
from azure_airbnb_cdc_ingestion_pipeline_spark.sources.tables import ParquetTable


def make_events(spark, landing_dir: str, n_events: int, n_files: int) -> None:
    """Deterministic booking JSON docs shaped like the Cosmos change feed
    (/root/reference/mock_data_in_cosmosdb.py:29-45): ~10% of booking_ids
    repeat (updates), dates sometimes inverted (quarantine path)."""
    df = (
        spark.range(n_events)
        .select(
            F.concat(F.lit("bk-"), (F.col("id") % int(n_events * 0.9)).cast("string")).alias("booking_id"),
            (F.col("id") % 500).cast("string").alias("customer_id"),
            F.concat(F.lit("prop-"), (F.col("id") % 1000).cast("string")).alias("property_id"),
            F.date_format(
                F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 300).cast("int")),
                "yyyy-MM-dd",
            ).alias("check_in_date"),
            F.date_format(
                F.date_add(
                    F.lit("2024-01-01").cast("date"),
                    # every 50th event: checkout BEFORE checkin (bad row)
                    F.when(F.col("id") % 50 == 0, (F.col("id") % 300).cast("int") - 2)
                    .otherwise((F.col("id") % 300).cast("int") + (F.col("id") % 13 + 1).cast("int")),
                ),
                "yyyy-MM-dd",
            ).alias("check_out_date"),
            (F.col("id") % 900 + 50.0).alias("amount"),
            F.lit("USD").alias("currency"),
            F.concat(F.lit("guest-"), (F.col("id") % 2000).cast("string")).alias("guest_name"),
            F.struct(
                F.concat(F.lit("city-"), (F.col("id") % 40).cast("string")).alias("city"),
                F.concat(F.lit("country-"), (F.col("id") % 12).cast("string")).alias("country"),
            ).alias("property_location"),
            F.date_format(
                F.timestamp_add(
                    "SECOND", (F.col("id")).cast("int"), F.lit("2024-06-01 00:00:00").cast("timestamp")
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("timestamp"),
            F.date_format(
                F.timestamp_add(
                    "SECOND", (F.col("id") % 86400).cast("int"), F.lit("2024-05-01 00:00:00").cast("timestamp")
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("booking_date"),
        )
    )
    df.repartition(n_files).write.mode("overwrite").json(landing_dir)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    landing = os.path.join(work, "landing")
    try:
        fact = ParquetTable(spark, os.path.join(work, "fact"))
        quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))

        # phase A — backfill: one big availableNow drain (full-table merge)
        make_events(spark, landing, n_events, n_files)
        t0 = time.perf_counter()
        load_booking_fact_stream(
            spark, landing, fact, quarantine, os.path.join(work, "ckpt"),
            available_now=True,
        )
        backfill_wall = time.perf_counter() - t0
        merged = fact.read().count()

        # phase B — steady state: drip small update batches, one file per
        # micro-batch, against the now-large fact (partition-pruned merge)
        drip_n, drip_files = max(n_events // 20, 1000), 5
        drip_dir = os.path.join(work, "drip")
        make_events(spark, drip_dir, drip_n, drip_files)
        import glob

        for f in glob.glob(os.path.join(drip_dir, "*.json")):
            shutil.move(f, os.path.join(landing, "drip_" + os.path.basename(f)))
        t0 = time.perf_counter()
        load_booking_fact_stream(
            spark, landing, fact, quarantine, os.path.join(work, "ckpt"),
            available_now=True, max_files_per_trigger=1,
        )
        steady_wall = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "cdc_merge_throughput",
                    "value": round(n_events / backfill_wall, 1),
                    "unit": "events/sec",
                    "events": n_events,
                    "wall_sec": round(backfill_wall, 2),
                    "fact_rows": merged,
                    "steady_state_events_per_sec": round(drip_n / steady_wall, 1),
                    "steady_state_batches": drip_files,
                    "target": 1000,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
