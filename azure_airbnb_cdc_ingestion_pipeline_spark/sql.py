"""SQL-string entry point: run ANSI SQL against the warehouse tables.

The engine is DataFrame-native (the reference exposes no user SQL either —
its transforms are declarative dataflow JSON), but a SQL surface costs
nothing on Spark: register the tables as temp views and hand the string to
``spark.sql`` — Catalyst plans it identically to the DataFrame catalog
queries (same pushdown / pruning / AQE). ``sql_passthrough_revenue`` in the
query catalog proves dialect-portable parity: the SAME string runs on Spark
and on the DuckDB oracle.

Scale posture: temp-view registration is metadata-only (no scan); every
query planned through this path gets the identical physical treatment as
its DataFrame twin — nothing here adds a shuffle or a materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register the warehouse parquet tables as temp views (metadata-only).

    ``events`` is registered through ``sources.readers.read_events`` so its
    nanosecond parquet timestamp arrives as a proper µs TIMESTAMP column
    in SQL, matching the DataFrame catalog's reader semantics.
    """
    from .sources.readers import read_events, read_table

    names = list(tables) if tables is not None else TABLES + ["events"]
    for t in names:
        # memoized lazy scans (r10): repeated registration of the same
        # immutable table re-paid a footer/schema read per view per
        # query (~0.7 s for the 10-view set); the temp-view overwrite
        # itself is metadata-cheap
        if t == "events":
            read_events(spark, sf_dir).createOrReplaceTempView(t)
        else:
            read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call SQL entry: register views, return the planned DataFrame."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
