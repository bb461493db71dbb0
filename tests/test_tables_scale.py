"""ParquetTable scale paths: O(batch) append and partition-pruned upsert
(hardlink-forward of untouched partitions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.sources.tables import ParquetTable


def _inodes(root: str) -> dict[str, int]:
    out = {}
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.stat(p).st_ino
    return out


def test_append_links_previous_version(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(100).withColumn("v", F.col("id") * 2))
    v1_dir = t._version_dir(t.current_version())
    v1_inodes = _inodes(v1_dir)

    t.append(spark.range(100, 150).withColumn("v", F.col("id") * 2))
    assert t.read().count() == 150
    v2_dir = t._version_dir(t.current_version())
    v2_inodes = _inodes(v2_dir)
    # every v1 file is present in v2 as a hardlink (same inode), plus new files
    assert set(v1_inodes.values()) <= set(v2_inodes.values())
    assert len(v2_inodes) > len(v1_inodes)


def test_upsert_pruned_rewrites_only_touched_partitions(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "fact"))
    base = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3 + 1).cast("int").alias("month"),
        F.lit(1).alias("ver"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    t.upsert_pruned(base, keys=["k"], partition_by=["month"], order_by=["ts"])
    v1_dir = t._version_dir(t.current_version())
    v1 = _inodes(v1_dir)

    # batch touches ONLY month=2 (updates + one insert)
    batch = spark.range(0, 20).select(
        (F.col("id") * 3 + 1).alias("k"),  # id*3+1 % 3 == 1 → month 2
        F.lit(2).cast("int").alias("month"),
        F.lit(2).alias("ver"),
        (F.col("id") + 5000).cast("timestamp").alias("ts"),
    )
    t.upsert_pruned(batch, keys=["k"], partition_by=["month"], order_by=["ts"])
    out = t.read()
    assert out.count() == 1000  # 20 updates, 0 net inserts
    assert out.filter("ver = 2").count() == 20
    assert out.filter("ver = 2").filter("month <> 2").count() == 0

    v2_dir = t._version_dir(t.current_version())
    v2 = _inodes(v2_dir)
    # untouched months are hardlinks of v1 files; month=2 files are new
    for rel, ino in v2.items():
        if "month=1" in rel or "month=3" in rel:
            assert ino in set(v1.values()), f"{rel} should be linked, not rewritten"
        elif "month=2" in rel:
            assert ino not in set(v1.values()), f"{rel} should be rewritten"


def test_upsert_pruned_matches_full_upsert(spark, tmp_path):
    rows = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        (F.col("id") * 10).alias("payload"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    batch = spark.range(100, 700).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        (F.col("id") * 10 + 1).alias("payload"),
        (F.col("id") + 9000).cast("timestamp").alias("ts"),
    )
    full = ParquetTable(spark, str(tmp_path / "full"))
    full.upsert(rows, keys=["k"], order_by=["ts"])
    full.upsert(batch, keys=["k"], order_by=["ts"])

    pruned = ParquetTable(spark, str(tmp_path / "pruned"))
    pruned.upsert_pruned(rows, keys=["k"], partition_by=["p"], order_by=["ts"])
    pruned.upsert_pruned(batch, keys=["k"], partition_by=["p"], order_by=["ts"])

    cols = ["k", "p", "payload"]
    got = sorted(tuple(r) for r in pruned.read().select(*cols).collect())
    want = sorted(tuple(r) for r in full.read().select(*cols).collect())
    assert got == want


def test_compact_reduces_file_count(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "c"))
    t.overwrite(spark.range(1000).repartition(16))
    for i in range(3):  # accumulate small files
        t.append(spark.range(1000 + i * 10, 1010 + i * 10).repartition(4))
    before = len(_inodes(t._version_dir(t.current_version())))
    assert before >= 20
    t.compact(target_rows_per_file=10_000)
    vdir = t._version_dir(t.current_version())
    assert len(_inodes(vdir)) == 1
    assert t.read().count() == 1030
