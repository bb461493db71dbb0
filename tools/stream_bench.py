"""CDC streaming-merge throughput bench.

BASELINE.md target: >= 1,000 events/s sustained through the
foreachBatch keyed merge (vs the reference's ~1,000 events/HOUR design
point, /root/reference/README.md:697-700).

Drives the real pipeline surface: JSON docs land in micro-batch files,
`load_booking_fact_stream` drains them with availableNow through
split -> derive -> keyed MERGE into the fact table. Prints one JSON line:
{"metric": "cdc_merge_throughput", "value": events_per_sec, ...}.

Usage: python tools/stream_bench.py [n_events] [n_files]
       python tools/stream_bench.py --soak [n_batches] [batch_events]
       python tools/stream_bench.py --skew [n_events] [n_files]

--soak (VERDICT r5 #3): merge-on-read read-amplification soak — drip
  n_batches 1-file micro-batches through the MoR path and time the
  RESOLVED fact read every chunk; the curve must stay flat (the
  periodic fold bounds accumulated deltas) rather than growing with
  batch count.

--skew (VERDICT r5 #8): steady-state drip with 80% of events in ONE
  (booking_year, booking_month) fact partition vs the uniform spread —
  the hot-partition merge is the realistic CDC failure mode.
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


def make_events(
    spark, landing_dir: str, n_events: int, n_files: int,
    month_spread: str = "single",
) -> None:
    """Deterministic booking JSON docs shaped like the Cosmos change feed
    (/root/reference/mock_data_in_cosmosdb.py:29-45): ~10% of booking_ids
    repeat (updates), dates sometimes inverted (quarantine path).

    ``month_spread`` drives the booking_date month — the fact table's
    partition key. Derived from the BOOKING KEY (not the event id) so a
    key's month is immutable across update events, the pruned-merge
    precondition:
    - "single": every event in one month (the original bench shape);
    - "uniform": keys spread evenly over 12 months;
    - "hot": 80% of keys in month 1, the rest over months 2-12 — the
      skewed-partition leg."""
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
            _booking_date_expr(n_events, month_spread).alias("booking_date"),
        )
    )
    df.repartition(n_files).write.mode("overwrite").json(landing_dir)


def _booking_date_expr(n_events: int, month_spread: str):
    bk = F.col("id") % int(n_events * 0.9)  # the booking KEY ordinal
    if month_spread == "single":
        return F.date_format(
            F.timestamp_add(
                "SECOND", (F.col("id") % 86400).cast("int"),
                F.lit("2024-05-01 00:00:00").cast("timestamp"),
            ),
            "yyyy-MM-dd HH:mm:ss",
        )
    if month_spread == "uniform":
        month = (bk % 12).cast("int")
    elif month_spread == "hot":
        # 80% of keys land in month 0; the rest spread over months 1-11
        month = (
            F.when(bk % 5 < 4, F.lit(0))
            .otherwise((bk % 11).cast("int") + 1)
            .cast("int")
        )
    else:
        raise ValueError(f"month_spread: {month_spread}")
    return F.date_format(
        F.timestamp_add(
            "SECOND",
            (bk % 86400).cast("int"),
            F.timestamp_add(
                "MONTH", month, F.lit("2024-01-01 00:00:00").cast("timestamp")
            ),
        ),
        "yyyy-MM-dd HH:mm:ss",
    )


def run_soak(n_batches: int = 200, batch_events: int = 1000) -> None:
    """Merge-on-read read-amplification soak: after a 100k backfill,
    drip `n_batches` single-file micro-batches through the MoR merge
    (fold every 16th batch, the upsert_delta default) and time the
    RESOLVED fact read after every chunk of 10. Bounded resolve cost =
    the curve saw-tooths with the fold cadence instead of trending up."""
    spark = get_spark("stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_soak_")
    landing = os.path.join(work, "landing")
    ckpt = os.path.join(work, "ckpt")
    chunk = 10
    try:
        fact = ParquetTable(spark, os.path.join(work, "fact"))
        quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))
        make_events(spark, landing, 100_000, 8)
        load_booking_fact_stream(
            spark, landing, fact, quarantine, ckpt, available_now=True
        )
        curve = []
        t0 = time.perf_counter()
        fact.read().count()
        curve.append({"batches": 0, "read_sec": round(time.perf_counter() - t0, 3)})
        drip_dir = os.path.join(work, "drip")
        done = 0
        while done < n_batches:
            n = min(chunk, n_batches - done)
            make_events(spark, drip_dir, batch_events * n, n)
            import glob

            for i, f in enumerate(sorted(glob.glob(os.path.join(drip_dir, "*.json")))):
                shutil.move(
                    f, os.path.join(landing, f"drip_{done + i:05d}.json")
                )
            drain_t0 = time.perf_counter()
            load_booking_fact_stream(
                spark, landing, fact, quarantine, ckpt,
                available_now=True, max_files_per_trigger=1,
            )
            drain_sec = time.perf_counter() - drain_t0
            done += n
            t0 = time.perf_counter()
            rows = fact.read().count()
            curve.append(
                {
                    "batches": done,
                    "read_sec": round(time.perf_counter() - t0, 3),
                    "drain_sec_per_batch": round(drain_sec / n, 3),
                }
            )
        reads = [c["read_sec"] for c in curve]
        # trend check: mean resolved-read latency over the last quarter
        # vs the first quarter of the run (post-backfill)
        q = max(1, len(reads) // 4)
        head, tail = reads[1 : 1 + q], reads[-q:]
        print(
            json.dumps(
                {
                    "metric": "mor_soak_read_amplification",
                    "batches": done,
                    "batch_events": batch_events,
                    "fold_after": 16,
                    "curve": curve,
                    "read_sec_first_quarter": round(sum(head) / len(head), 3),
                    "read_sec_last_quarter": round(sum(tail) / len(tail), 3),
                    "fact_rows": rows,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_skew(n_events: int = 100_000, n_files: int = 8) -> None:
    """Skewed-partition steady state (80% of keys in one fact month) vs
    the uniform 12-month spread — same backfill size, same drip volume,
    one leg each. Reports the throughput ratio."""
    spark = get_spark("stream-skew")
    spark.sparkContext.setLogLevel("ERROR")
    legs = {}
    for leg in ("uniform", "hot"):
        work = tempfile.mkdtemp(prefix=f"stream_skew_{leg}_")
        landing = os.path.join(work, "landing")
        ckpt = os.path.join(work, "ckpt")
        try:
            fact = ParquetTable(spark, os.path.join(work, "fact"))
            quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))
            make_events(spark, landing, n_events, n_files, month_spread=leg)
            t0 = time.perf_counter()
            load_booking_fact_stream(
                spark, landing, fact, quarantine, ckpt, available_now=True
            )
            backfill_wall = time.perf_counter() - t0
            drip_n, drip_files = max(n_events // 20, 1000), 5
            drip_dir = os.path.join(work, "drip")
            make_events(spark, drip_dir, drip_n, drip_files, month_spread=leg)
            import glob

            for f in glob.glob(os.path.join(drip_dir, "*.json")):
                shutil.move(f, os.path.join(landing, "drip_" + os.path.basename(f)))
            t0 = time.perf_counter()
            load_booking_fact_stream(
                spark, landing, fact, quarantine, ckpt,
                available_now=True, max_files_per_trigger=1,
            )
            steady_wall = time.perf_counter() - t0
            legs[leg] = {
                "backfill_events_per_sec": round(n_events / backfill_wall, 1),
                "steady_state_events_per_sec": round(drip_n / steady_wall, 1),
                "fact_rows": fact.read().count(),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)
    ratio = (
        legs["uniform"]["steady_state_events_per_sec"]
        / legs["hot"]["steady_state_events_per_sec"]
    )
    print(
        json.dumps(
            {
                "metric": "cdc_skewed_partition_merge",
                "events": n_events,
                "hot_fraction": 0.8,
                "uniform": legs["uniform"],
                "hot": legs["hot"],
                "uniform_over_hot_steady_ratio": round(ratio, 2),
                "target_ratio_max": 2.0,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--soak":
        run_soak(
            int(sys.argv[2]) if len(sys.argv) > 2 else 200,
            int(sys.argv[3]) if len(sys.argv) > 3 else 1000,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        run_skew(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 8,
        )
        return
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
