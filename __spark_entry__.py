"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``azure_airbnb_cdc_ingestion_pipeline_spark``;
this module is a thin adapter over its query catalog
(``plans/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_airbnb_cdc_ingestion_pipeline_spark.plans import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (gold star-join aggregation) on sf0.001."""
    return _catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_catalog.ORACLE_SQL)
