"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with the noop sink (no
driver-side collect, all columns computed) — measures the executor-side
plan, not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark

HEADLINE = [
    # reference-parity relational core
    "agg_groupby_join",
    "join_inner_equi",
    "derive_columns",
    "topk_per_group",
    "lookup_join_latest",
    "sink_upsert_merge",
    "scd1_upsert",
    "filter_split_good",
    # charter extensions: windows / dedup / similarity / text
    "window_ranking",
    "window_session",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    # relational depth: TPC-H-style wide agg + top-N join
    "sql_pricing_summary",
    "sql_top_revenue_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing once (excluded from per-query timing)
    QUERIES["agg_groupby_join"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    names = [n for n in HEADLINE if n in QUERIES]
    extra = [n for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",") if n]
    for name in names + extra:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
