"""End-to-end pipeline tests against the FIXTURES.md F1/F2 fixtures:
dim lifecycle (list→upsert→archive→delete), CDC fact merge with quality
quarantine, gold golden-output check vs a DuckDB oracle, streaming
incremental + replay idempotence."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.pipelines import (
    load_booking_fact_stream,
    run_cdc_pipeline,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.sources.tables import ParquetTable

from fixtures import gen_booking_events, write_booking_events_json, write_customer_csv_drops


@pytest.fixture()
def workspace(tmp_path):
    ws = {
        "raw": str(tmp_path / "customer_raw_data"),
        "archive": str(tmp_path / "customer_archive"),
        "landing": str(tmp_path / "booking_feed"),
        "warehouse": str(tmp_path / "warehouse"),
        "checkpoint": str(tmp_path / "checkpoint"),
    }
    write_customer_csv_drops(ws["raw"])
    write_booking_events_json(ws["landing"], n_files=4, n=400, n_keys=350)
    return ws


def test_cdc_pipeline_end_to_end(spark, workspace):
    tables = run_cdc_pipeline(
        spark,
        customer_raw_dir=workspace["raw"],
        customer_archive_dir=workspace["archive"],
        booking_landing_dir=workspace["landing"],
        warehouse_dir=workspace["warehouse"],
        checkpoint_dir=workspace["checkpoint"],
    )

    # --- dim: 100 customers, SCD1 overwrite = later file wins -------------
    dim = tables["dim"].read()
    assert dim.count() == 100
    # ids 1-8 were re-dropped in file 2 with seed+2 values; the overwrite
    # must have replaced file-1 values (spot-check one field changes with seed)
    row = dim.filter(F.col("customer_id") == 1).collect()[0]
    assert row.first_name == "First1"  # stable field survives

    # file lifecycle: raw emptied, archive holds the 3 processed files
    assert os.listdir(workspace["raw"]) == []
    assert len(os.listdir(workspace["archive"])) == 3

    # --- fact + quarantine: exact counts from the generator ---------------
    events = gen_booking_events(n=400, n_keys=350)
    bad = [e for e in events if e["check_out_date"] < e["check_in_date"]]
    good = [e for e in events if e["check_out_date"] >= e["check_in_date"]]
    fact = tables["fact"].read()
    assert tables["quarantine"].read().count() == len(bad)
    assert fact.count() == len({e["booking_id"] for e in good})

    # updates resolve to the latest timestamp per booking_id
    latest = {}
    for e in good:
        k = e["booking_id"]
        if k not in latest or e["timestamp"] > latest[k]["timestamp"]:
            latest[k] = e
    some_key = next(k for k in latest if sum(1 for e in good if e["booking_id"] == k) > 1)
    got = fact.filter(F.col("booking_id") == some_key).collect()[0]
    assert got.timestamp.strftime("%Y-%m-%d %H:%M:%S") == latest[some_key]["timestamp"]

    # --- gold golden-output vs DuckDB oracle (F4) --------------------------
    gold = tables["gold"].read().toPandas()
    con = duckdb.connect()
    con.register("fact_pd", fact.toPandas())
    con.register("dim_pd", dim.toPandas())
    expected = con.sql(
        """
        SELECT d.country, count(*) AS total_bookings,
               round(sum(coalesce(f.amount,0)),2) AS total_amount,
               max(f.booking_date) AS last_booking_date
        FROM fact_pd f JOIN dim_pd d ON f.customer_id = d.customer_id
        GROUP BY d.country
        """
    ).df()
    gold = gold.sort_values("country").reset_index(drop=True)
    expected = expected.sort_values("country").reset_index(drop=True)
    assert list(gold.country) == list(expected.country)
    assert list(gold.total_bookings) == list(expected.total_bookings)
    assert [round(v, 2) for v in gold.total_amount] == list(expected.total_amount)


def test_streaming_incremental_and_replay(spark, tmp_path):
    landing = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    write_booking_events_json(landing, n_files=2, n=100, n_keys=90)
    fact = ParquetTable(spark, f"{wh}/fact")
    quarantine = ParquetTable(spark, f"{wh}/rej")

    load_booking_fact_stream(spark, landing, fact, quarantine, ckpt)
    count1 = fact.read().count()
    v1 = fact.current_version()

    # replay with no new files: checkpoint skips everything, state unchanged
    load_booking_fact_stream(spark, landing, fact, quarantine, ckpt)
    assert fact.read().count() == count1

    # drop new events for EXISTING keys with later timestamps → updates only
    events = gen_booking_events(n=100, n_keys=90)
    good_keys = [
        e["booking_id"] for e in events
        if e["check_out_date"] >= e["check_in_date"]
    ]
    import json

    by_key = {}
    for e in events:  # first event per key = the booking's creation record
        by_key.setdefault(e["booking_id"], e)
    upd_path = os.path.join(landing, "feed_new.json")
    with open(upd_path, "w") as f:
        for i, k in enumerate(good_keys[:10]):
            # an update mutates stay dates/amount but NEVER booking_date
            # (creation time) — the invariant the partitioned merge relies on
            e = dict(by_key[k])
            e["check_in_date"] = "2024-06-01"
            e["check_out_date"] = "2024-06-05"
            e["amount"] = 111.11
            e["timestamp"] = f"2025-01-01 00:00:{i:02d}"
            f.write(json.dumps(e) + "\n")

    load_booking_fact_stream(spark, landing, fact, quarantine, ckpt)
    assert fact.current_version() > v1
    # updates, not inserts: count unchanged; amounts overwritten
    assert fact.read().count() == count1
    updated = fact.read().filter(F.col("amount") == 111.11).count()
    assert updated == len(set(good_keys[:10]))
