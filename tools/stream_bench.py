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
       python tools/stream_bench.py --bigfact [seed_events] [drip_batches]
       python tools/stream_bench.py --crash [n_events] [n_kills]
       python tools/stream_bench.py --latency [duration_sec] [batch_events] [drip_period]

--soak (VERDICT r5 #3): merge-on-read read-amplification soak — drip
  n_batches 1-file micro-batches through the MoR path and time the
  RESOLVED fact read every chunk; the curve must stay flat (the
  periodic fold bounds accumulated deltas) rather than growing with
  batch count.

--skew (VERDICT r5 #8): steady-state drip with 80% of events in ONE
  (booking_year, booking_month) fact partition vs the uniform spread —
  the hot-partition merge is the realistic CDC failure mode.

--bigfact (VERDICT r6 #2): steady-state 1 k-event micro-batches against
  a ≥50 M-row fact seeded across 120 month partitions — the reference's
  real workload shape (small stream, huge fact). Reports per-batch
  drain cost on the big fact vs an identically-shaped SMALL fact
  (independence ratio) and vs the full resolved-read wall (the pruning
  evidence: an unpruned merge would pay the full-read cost per batch).

--crash (VERDICT r6 #7): exactly-once under repeated SIGKILL — drain a
  multi-batch landing in a CHILD process, kill -9 it mid-drain several
  times, resume, and diff the final fact/quarantine against an
  uninterrupted reference drain of the same files. Zero dupes, zero
  loss, byte-equal content.
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
    df = _events_df(spark, n_events, month_spread)
    df.repartition(n_files).write.mode("overwrite").json(landing_dir)


def _events_df(spark, n_events: int, month_spread: str = "single"):
    return (
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
            F.concat(F.lit("owner-"), (F.col("id") % 300).cast("string")).alias("owner_id"),
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
    elif month_spread == "wide":
        # 120 month partitions (10 years) — the big-fact seeding shape
        month = (bk % 120).cast("int")
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


def _seed_fact(spark, fact, n_events: int) -> int:
    """Seed the fact DIRECTLY from derived events (no JSON round-trip):
    latest-per-key over a `wide`-spread event set → one partitioned
    overwrite across 120 (booking_year, booking_month) dirs. Returns
    the seeded row count."""
    from azure_airbnb_cdc_ingestion_pipeline_spark.operators.merge import (
        latest_per_key,
    )
    from azure_airbnb_cdc_ingestion_pipeline_spark.pipelines.load_booking_fact import (
        FACT_KEYS, FACT_ORDER, FACT_PARTITIONING, transform_bookings,
    )

    derived, _rejected = transform_bookings(
        _events_df(spark, n_events, month_spread="wide")
    )
    latest = latest_per_key(derived, FACT_KEYS, FACT_ORDER)
    fact.overwrite(latest, partition_by=FACT_PARTITIONING)
    return fact.read().count()


def _recent_month_drip(spark, landing_dir: str, n_events: int, n_files: int,
                       n_seed_events: int) -> None:
    """Update events confined to ONE hot month partition (month index
    119 — 'the current month' of the 120-month fact): booking keys
    ≡ 119 (mod 120), all inside the seeded key range, so every event is
    an UPDATE of an existing fact row and the month precondition holds."""
    n_keys = max(1, min(n_events, (int(n_seed_events * 0.9) - 120) // 120))
    bk = (F.col("id") % n_keys) * 120 + 119
    # customer_id must equal the booking's CURRENT fact customer (a real
    # CDC update edits amounts/dates, it does not reassign the customer).
    # The seed's winner for key K is its latest event: id K+0.9n when the
    # key had two seed events (K < 0.1n), else id K — so the update
    # carries that event's customer. (r8: the latency leg's gold parity
    # check caught the old id%500 churning customers, which MOVES rows
    # across dim groups and shrinks group maxima — the documented
    # incremental-max limitation, not an update-in-place workload.)
    nine = int(n_seed_events * 0.9)
    winner = F.when(bk < n_seed_events - nine, bk + nine).otherwise(bk)
    df = (
        spark.range(n_events)
        .select(
            F.concat(F.lit("bk-"), bk.cast("string")).alias("booking_id"),
            # INT, not string: BOOKING_DOC_SCHEMA types customer_id int,
            # and the schema-enforced JSON read NULLs a quoted value —
            # which silently orphaned every update from its dim group
            # (r8: found by the latency leg's gold parity check)
            (winner % 500).cast("int").alias("customer_id"),
            F.concat(F.lit("prop-"), (F.col("id") % 1000).cast("string")).alias("property_id"),
            F.lit("2024-03-01").alias("check_in_date"),
            F.lit("2024-03-05").alias("check_out_date"),
            (F.col("id") % 900 + 75.0).alias("amount"),
            F.lit("USD").alias("currency"),
            F.concat(F.lit("owner-"), (F.col("id") % 300).cast("string")).alias("owner_id"),
            F.concat(F.lit("guest-"), (F.col("id") % 2000).cast("string")).alias("guest_name"),
            F.struct(
                F.concat(F.lit("city-"), (F.col("id") % 40).cast("string")).alias("city"),
                F.concat(F.lit("country-"), (F.col("id") % 12).cast("string")).alias("country"),
            ).alias("property_location"),
            F.date_format(
                F.timestamp_add(
                    "SECOND", (F.col("id")).cast("int"),
                    F.lit("2034-06-01 00:00:00").cast("timestamp"),
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("timestamp"),
            # same formula the seed used for these keys: month = bk % 120
            F.date_format(
                F.timestamp_add(
                    "SECOND", (bk % 86400).cast("int"),
                    F.timestamp_add(
                        "MONTH", F.lit(119),
                        F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    ),
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("booking_date"),
        )
    )
    df.repartition(n_files).write.mode("overwrite").json(landing_dir)


def run_bigfact(seed_events: int = 60_000_000, drip_batches: int = 20,
                batch_events: int = 1000) -> None:
    """Small stream vs huge fact (VERDICT r6 #2): per-batch merge cost
    must be governed by the BATCH (plus its one hot partition), not the
    fact size. Two identically-shaped seeds — `seed_events` (big) and
    seed_events/100 (small) — take the same 20×1k drip; the cost ratio
    big/small is the independence measure, and the full resolved-read
    wall is the anti-baseline (an unpruned merge would pay ~that per
    batch)."""
    spark = get_spark("stream-bigfact")
    spark.sparkContext.setLogLevel("ERROR")
    legs = {}
    for leg, n_seed in (("small", seed_events // 100), ("big", seed_events)):
        work = tempfile.mkdtemp(prefix=f"stream_bigfact_{leg}_")
        landing = os.path.join(work, "landing")
        ckpt = os.path.join(work, "ckpt")
        try:
            fact = ParquetTable(spark, os.path.join(work, "fact"))
            quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))
            t0 = time.perf_counter()
            rows = _seed_fact(spark, fact, n_seed)
            seed_sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            full_read_rows = fact.read().count()
            full_read_sec = time.perf_counter() - t0
            os.makedirs(landing, exist_ok=True)
            drain_secs = []
            import glob

            drip_dir = os.path.join(work, "drip")
            for b in range(drip_batches):
                _recent_month_drip(
                    spark, drip_dir, batch_events, 1, n_seed
                )
                for f in glob.glob(os.path.join(drip_dir, "*.json")):
                    shutil.move(
                        f, os.path.join(landing, f"drip_{b:04d}.json")
                    )
                t0 = time.perf_counter()
                load_booking_fact_stream(
                    spark, landing, fact, quarantine, ckpt,
                    available_now=True, max_files_per_trigger=1,
                )
                drain_secs.append(round(time.perf_counter() - t0, 3))
            steady = sorted(drain_secs)[len(drain_secs) // 2]  # median
            legs[leg] = {
                "fact_rows": rows,
                "seed_sec": round(seed_sec, 1),
                "full_read_sec": round(full_read_sec, 2),
                "full_read_rows": full_read_rows,
                "drain_sec_per_batch": drain_secs,
                "median_drain_sec": steady,
                "steady_state_events_per_sec": round(batch_events / steady, 1),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "cdc_bigfact_merge",
                "batch_events": batch_events,
                "drip_batches": drip_batches,
                "small": legs["small"],
                "big": legs["big"],
                "big_over_small_drain_ratio": round(
                    legs["big"]["median_drain_sec"]
                    / legs["small"]["median_drain_sec"], 2
                ),
                "big_drain_vs_full_read": round(
                    legs["big"]["median_drain_sec"]
                    / max(legs["big"]["full_read_sec"], 1e-9), 3
                ),
                "target_events_per_sec": 1000,
            }
        )
    )


class _GoldCommitLog(ParquetTable):
    """ParquetTable that wall-stamps every overwrite — the gold table's
    per-batch commit instants for the latency leg."""

    def __init__(self, spark, path):
        super().__init__(spark, path)
        self.commits: list[float] = []
        self.armed = False  # ignore the standing-gold seed overwrite

    def overwrite(self, df, **kw):
        out = super().overwrite(df, **kw)
        if self.armed:
            self.commits.append(time.time())
        return out


def run_latency(duration_sec: int = 630, batch_events: int = 1000,
                drip_period: float = 5.0, seed_events: int = 6_000_000,
                trigger: str = "2 seconds") -> None:
    """Continuous-trigger steady-latency leg (VERDICT r7 #6): a REAL
    ``processingTime`` trigger (not an availableNow drain) runs for
    ``duration_sec`` while a feeder drops one ``batch_events``-event file
    every ``drip_period`` seconds, with INCREMENTAL GOLD maintenance on
    every batch. Reports p50/p99 event→fact and event→gold visibility
    latency (file-drop wall → batch commit / gold overwrite wall) and
    proves the incrementally-maintained gold equals a from-scratch
    rebuild of the final fact.

    Batch↔file matching: files are dropped with strictly increasing
    mtimes and ``maxFilesPerTrigger=1``, so the k-th non-empty batch
    consumes the k-th dropped file (FileStreamSource ordering).
    Event→fact latency uses the batch's trigger-end instant — the
    exactly-once visibility point (foreachBatch committed); gold commits
    are wall-stamped inside the batch by a table subclass, so the two
    latencies honestly split the in-batch work."""
    import glob
    from datetime import datetime, timezone

    from azure_airbnb_cdc_ingestion_pipeline_spark.operators.aggregate import (
        gold_booking_aggregation,
    )

    spark = get_spark("stream-latency")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_latency_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    try:
        fact = ParquetTable(spark, os.path.join(work, "fact"))
        quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))
        gold = _GoldCommitLog(spark, os.path.join(work, "gold"))
        dim = spark.createDataFrame(
            [(i, f"country-{i % 12}") for i in range(500)],
            "customer_id int, country string",
        )
        t0 = time.perf_counter()
        seeded = _seed_fact(spark, fact, seed_events)
        seed_sec = time.perf_counter() - t0
        gold.overwrite(gold_booking_aggregation(fact.read(), dim))
        gold.armed = True

        # pre-generate every drip file up front so the feeder is a pure
        # file move — no Spark jobs compete with the running trigger
        n_files = int(duration_sec // drip_period)
        stage = os.path.join(work, "stage")
        _recent_month_drip(
            spark, stage, batch_events * n_files, n_files, seed_events
        )
        staged = sorted(glob.glob(os.path.join(stage, "*.json")))

        q = load_booking_fact_stream(
            spark, landing, fact, quarantine, os.path.join(work, "ckpt"),
            dim=dim, gold=gold, available_now=False,
            processing_time=trigger, max_files_per_trigger=1,
            incremental_gold=True,
        )
        drops: list[float] = []
        progresses: dict[int, dict] = {}

        def absorb():
            for p in q.recentProgress:
                progresses[int(p["batchId"])] = p

        t_start = time.time()
        for k, src in enumerate(staged):
            tgt = os.path.join(landing, f"drip_{k:05d}.json")
            shutil.move(src, tgt)
            os.utime(tgt)  # strictly-increasing mtime = source order
            drops.append(time.time())
            deadline = t_start + (k + 1) * drip_period
            while time.time() < deadline:
                absorb()
                time.sleep(0.4)
        tail_deadline = time.time() + 30
        while time.time() < tail_deadline:
            absorb()
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        absorb()

        nonempty = [
            p for _bid, p in sorted(progresses.items())
            if int(p.get("numInputRows", 0)) > 0
        ]
        lat_fact, lat_gold = [], []
        batch_walls = []  # (batchId, triggerExecution_sec, latency_sec)
        for i, p in enumerate(nonempty[: len(drops)]):
            start = datetime.fromisoformat(
                p["timestamp"].replace("Z", "+00:00")
            ).astimezone(timezone.utc).timestamp()
            end = start + float(p["durationMs"]["triggerExecution"]) / 1e3
            lat_fact.append(end - drops[i])
            batch_walls.append(
                (
                    int(p["batchId"]),
                    round(float(p["durationMs"]["triggerExecution"]) / 1e3, 3),
                    round(end - drops[i], 3),
                    {k: int(v) for k, v in p["durationMs"].items()},
                )
            )
        for i, gw in enumerate(gold.commits[: len(drops)]):
            lat_gold.append(gw - drops[i])
        # tail attribution (r9, VERDICT r8 #7): the slowest batches by
        # in-batch wall, with the progress-API duration breakdown — the
        # evidence for whether the p99 tail is merge stragglers (e.g.
        # the every-16th MoR fold) or trigger phase alignment
        slowest = sorted(batch_walls, key=lambda t: -t[1])[:6]

        def pct(xs, q_):
            if not xs:
                return None
            xs = sorted(xs)
            return round(xs[min(len(xs) - 1, int(q_ * len(xs)))], 3)

        # end-state parity: incremental gold == batch rebuild. count/max
        # are exact by algebra; total_amount is a DOUBLE sum whose
        # incremental (+/- retraction) accumulation order differs from a
        # fresh aggregation, so it carries float-epsilon drift — the
        # documented materialized-view limitation (merge_gold docstring;
        # a periodic full refresh re-zeros it). Parity gates at the repo's
        # 6 dp money convention; exact-diff and max drift are reported so
        # the epsilon claim is checkable.
        from pyspark.sql import functions as _F

        def _r6(df):
            return df.select(
                "country", "total_bookings", "last_booking_date",
                _F.round("total_amount", 6).alias("total_amount"),
            )

        rebuilt = gold_booking_aggregation(fact.read(), dim)
        live = gold.read()
        parity_diff = (
            _r6(rebuilt).exceptAll(_r6(live)).count()
            + _r6(live).exceptAll(_r6(rebuilt)).count()
        )
        exact_diff = (
            rebuilt.exceptAll(live).count() + live.exceptAll(rebuilt).count()
        )
        drift = (
            rebuilt.alias("r")
            .join(live.alias("l"), "country")
            .select(
                _F.max(
                    _F.abs(
                        _F.col("r.total_amount") - _F.col("l.total_amount")
                    )
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        print(
            json.dumps(
                {
                    "metric": "cdc_continuous_trigger_latency",
                    "trigger": trigger,
                    "duration_sec": round(time.time() - t_start, 1),
                    "batch_events": batch_events,
                    "drip_period_sec": drip_period,
                    "files_dropped": len(drops),
                    "batches_nonempty": len(nonempty),
                    "gold_commits": len(gold.commits),
                    "fact_rows_seeded": seeded,
                    "seed_sec": round(seed_sec, 1),
                    "event_to_fact_p50_sec": pct(lat_fact, 0.50),
                    "event_to_fact_p99_sec": pct(lat_fact, 0.99),
                    "event_to_gold_p50_sec": pct(lat_gold, 0.50),
                    "event_to_gold_p99_sec": pct(lat_gold, 0.99),
                    "offered_events_per_sec": round(
                        batch_events / drip_period, 1
                    ),
                    "gold_parity_diff_rows_6dp": parity_diff,
                    "gold_parity_exact_diff_rows": exact_diff,
                    "gold_max_amount_drift": drift,
                    "batch_wall_p50_sec": pct([w for _b, w, _l, _d in batch_walls], 0.50),
                    "batch_wall_p99_sec": pct([w for _b, w, _l, _d in batch_walls], 0.99),
                    "slowest_batches": [
                        {
                            "batch_id": b,
                            "wall_sec": w,
                            "event_to_fact_sec": lt,
                            "duration_ms": dm,
                        }
                        for b, w, lt, dm in slowest
                    ],
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _crash_child(work: str) -> None:
    """Child-process entry: drain whatever is pending, one file per
    trigger. The parent SIGKILLs this mid-drain."""
    spark = get_spark("stream-crash-child")
    spark.sparkContext.setLogLevel("ERROR")
    fact = ParquetTable(spark, os.path.join(work, "fact"))
    quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))
    load_booking_fact_stream(
        spark, os.path.join(work, "landing"), fact, quarantine,
        os.path.join(work, "ckpt"), available_now=True,
        max_files_per_trigger=1,
    )


def run_crash(n_events: int = 100_000, n_kills: int = 3,
              kill_after_sec: float = 25.0) -> None:
    """Exactly-once under repeated SIGKILL (VERDICT r6 #7): the same
    landing files drain twice — once in child processes killed -9
    mid-drain `n_kills` times then resumed to completion, once
    uninterrupted as the reference — and the final fact + quarantine
    contents must be IDENTICAL (checkpoint replay + txn-marker
    idempotent sinks)."""
    import subprocess

    spark = get_spark("stream-crash")
    spark.sparkContext.setLogLevel("ERROR")
    n_files = 100
    work = tempfile.mkdtemp(prefix="stream_crash_")
    ref_work = tempfile.mkdtemp(prefix="stream_crash_ref_")
    try:
        landing = os.path.join(work, "landing")
        make_events(spark, landing, n_events, n_files)
        # identical landing for the reference drain
        shutil.copytree(landing, os.path.join(ref_work, "landing"))

        kills = 0
        attempts = []
        t_start = time.perf_counter()
        while True:
            child = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--crash-child", work],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if kills < n_kills:
                try:
                    child.wait(timeout=kill_after_sec)
                    # finished before the kill window — drain complete
                    attempts.append({"outcome": "completed_early"})
                    break
                except subprocess.TimeoutExpired:
                    child.kill()  # SIGKILL, no cleanup, mid-batch
                    child.wait()
                    kills += 1
                    attempts.append({"outcome": f"sigkill_{kills}"})
                    continue
            child.wait()
            attempts.append(
                {"outcome": "completed", "rc": child.returncode}
            )
            if child.returncode != 0:
                raise RuntimeError("final drain failed")
            break
        wall = time.perf_counter() - t_start

        # uninterrupted reference drain over the SAME files
        ref_fact = ParquetTable(spark, os.path.join(ref_work, "fact"))
        ref_quar = ParquetTable(spark, os.path.join(ref_work, "quarantine"))
        load_booking_fact_stream(
            spark, os.path.join(ref_work, "landing"), ref_fact, ref_quar,
            os.path.join(ref_work, "ckpt"), available_now=True,
            max_files_per_trigger=1,
        )
        fact = ParquetTable(spark, os.path.join(work, "fact"))
        quarantine = ParquetTable(spark, os.path.join(work, "quarantine"))
        got_f, ref_f = fact.read(), ref_fact.read()
        got_q, ref_q = quarantine.read(), ref_quar.read()
        fact_equal = (
            got_f.count() == ref_f.count()
            and got_f.exceptAll(ref_f).isEmpty()
            and ref_f.exceptAll(got_f).isEmpty()
        )
        quar_equal = (
            got_q.count() == ref_q.count()
            and got_q.exceptAll(ref_q).isEmpty()
            and ref_q.exceptAll(got_q).isEmpty()
        )
        print(
            json.dumps(
                {
                    "metric": "cdc_crash_recovery",
                    "events": n_events,
                    "files": n_files,
                    "sigkills": kills,
                    "kill_after_sec": kill_after_sec,
                    "attempts": attempts,
                    "wall_sec": round(wall, 1),
                    "fact_rows": got_f.count(),
                    "quarantine_rows": got_q.count(),
                    "fact_equals_reference": fact_equal,
                    "quarantine_equals_reference": quar_equal,
                }
            )
        )
        if not (fact_equal and quar_equal):
            sys.exit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(ref_work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--crash-child":
        _crash_child(sys.argv[2])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bigfact":
        run_bigfact(
            int(sys.argv[2]) if len(sys.argv) > 2 else 60_000_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 20,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--crash":
        run_crash(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--latency":
        run_latency(
            int(sys.argv[2]) if len(sys.argv) > 2 else 630,
            int(sys.argv[3]) if len(sys.argv) > 3 else 1000,
            float(sys.argv[4]) if len(sys.argv) > 4 else 5.0,
        )
        return
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
