"""Dump the FULL lazy plan of queries whose interesting upstream is
normally hidden behind an eager localCheckpoint (pagerank's iteration
loop, substring-span dedup's mark pass).

Usage: python tools/plan_dump_inner.py <tag> <suffix> [sf_dir]

Monkeypatches DataFrame.localCheckpoint to identity for the duration,
so .explain("formatted") shows the whole tree (nothing is executed by
the explain itself; the queries' own dispatch counts still run).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf10"

    # Spark 4: sessions hand out the classic concrete DataFrame — patch
    # THAT class (the pyspark.sql.DataFrame facade's attribute is not
    # what instance method lookup hits)
    from pyspark.sql.classic.dataframe import DataFrame

    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
    from azure_airbnb_cdc_ingestion_pipeline_spark.session import (
        get_spark,
        release_persisted,
    )

    spark = get_spark("plan-dump-inner")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    def _dump(name: str, df) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_inner_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {os.path.basename(path)} ({len(plan)} chars)")
        release_persisted()

    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore
    try:
        _dump(
            "dedup_substring_spans",
            QUERIES["dedup_substring_spans"](spark, sf_dir),
        )
        # pagerank: ONE forced big-path iteration so the per-round plan
        # shape (cache scan -> broadcast join -> window -> partial agg ->
        # exchange -> final agg -> combine) is readable; the full 5-round
        # lineage without checkpoints is a 300 kB wall of repeated trees.
        from azure_airbnb_cdc_ingestion_pipeline_spark.operators.graph import (
            copurchase_pagerank,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        _dump(
            "graph_pagerank_iter1",
            copurchase_pagerank(
                li, iterations=1, small_input_rows=0, driver_rows=0
            ),
        )
    finally:
        DataFrame.localCheckpoint = orig  # type: ignore


if __name__ == "__main__":
    main()
