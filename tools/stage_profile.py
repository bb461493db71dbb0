"""Per-stage wall/IO breakdown for one catalog query at one SF — the
'where does the time actually go' probe the optimization guide (§1, §7)
asks for before touching anything.

Usage: python tools/stage_profile.py <query> [sf_dir] [runs]

Prints each stage of the query's run window with wall (completion −
submission), executorRunTime sum, shuffle read/write and input bytes,
plus the gaps BETWEEN stages (driver/scheduling time the stage table
does not show).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
    from azure_airbnb_cdc_ingestion_pipeline_spark.session import (
        get_spark,
        release_persisted,
    )

    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"

    # warm once so JVM/codegen/file-listing costs do not pollute the probe
    QUERIES["agg_groupby_join"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted(blocking=True)

    for run in range(runs):
        before = {s["stageId"] for s in _get(f"{base}/stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_persisted(blocking=True)
        stages = [
            s
            for s in _get(f"{base}/stages?status=complete")
            if s["stageId"] not in before
        ]
        stages.sort(key=lambda s: s.get("submissionTime", ""))
        print(f"\n=== {name} run {run}: wall {wall:.2f}s, {len(stages)} stages ===")
        from datetime import datetime

        def ts(v):
            return datetime.strptime(v[:23], "%Y-%m-%dT%H:%M:%S.%f")

        prev_end = None
        gap_total = 0.0
        stage_total = 0.0
        for s in stages:
            sub, comp = ts(s["submissionTime"]), ts(s["completionTime"])
            w = (comp - sub).total_seconds()
            stage_total += w
            gap = (sub - prev_end).total_seconds() if prev_end else 0.0
            if gap > 0:
                gap_total += gap
            prev_end = max(prev_end, comp) if prev_end else comp
            nm = s.get("description") or s.get("name", "")
            print(
                f"  s{s['stageId']:<5d} {w:6.2f}s gap{max(gap,0):5.2f}s "
                f"tasks={s['numCompleteTasks']:<4d} "
                f"in={s.get('inputBytes',0)/1e6:7.1f}MB "
                f"sr={s.get('shuffleReadBytes',0)/1e6:7.1f}MB "
                f"sw={s.get('shuffleWriteBytes',0)/1e6:7.1f}MB  {nm[:70]}"
            )
        print(
            f"  stage-wall sum {stage_total:.2f}s, inter-stage gaps {gap_total:.2f}s,"
            f" query wall {wall:.2f}s"
        )


if __name__ == "__main__":
    main()
