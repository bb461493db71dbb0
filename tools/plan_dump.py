"""Dump `.explain("formatted")` for headline queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]
  e.g. python tools/plan_dump.py r10 before graph_pagerank dedup_simhash
With no query list, dumps every bench headline query.

The optimization-round contract (OPTIMIZATION_r10.md) wants the
formatted physical plan for every touched query committed as
plans/r10/<query>_before.txt / _after.txt so plan-shape claims
(Exchange count, join strategy, PushedFilters) are checkable offline.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
    from azure_airbnb_cdc_ingestion_pipeline_spark.session import (
        get_spark,
        release_persisted,
    )

    if not names:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in QUERIES]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            plan = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
        release_persisted()


if __name__ == "__main__":
    main()
