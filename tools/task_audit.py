"""Executor-posture audit (VERDICT r7 #7): per-query task-size evidence
at a large SF — max task input bytes, shuffle read/write, spill, peak
execution memory — captured from the Spark UI REST API per stage.

Scale walls prove linearity; this proves the 100×-CLUSTER claim at the
task level: a query whose max task input exceeds ~1 GiB would not
schedule cleanly on real executors regardless of how linear its wall
is. Runs each query at the given SF inside its own stage-id window
(sequential execution → stages created between start and end belong to
the query), then pulls per-stage task summaries (quantiles 0.5/1.0).

Writes ``TASK_AUDIT_r{N}.json``:
  {"sf_dir": ..., "queries": {name: {
      "wall_sec", "stages", "max_task_input_mb", "p50_task_input_mb",
      "max_task_shuffle_read_mb", "max_task_shuffle_write_mb",
      "sum_disk_spill_mb", "sum_memory_spill_mb",
      "max_task_peak_exec_memory_mb", "max_input_stage_id"}}}

Usage:
  python tools/task_audit.py --sf-dir .scale/sf100 \
      --queries graph_pagerank,text_bm25_rank --out TASK_AUDIT_r08.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MB = 1024.0 * 1024.0


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def _stage_ids(base: str) -> set[int]:
    try:
        return {s["stageId"] for s in _get(f"{base}/stages")}
    except Exception:
        return set()


def _summary(base: str, sid: int, attempt: int) -> dict | None:
    try:
        s = _get(
            f"{base}/stages/{sid}/{attempt}/taskSummary"
            f"?quantiles=0.5,1.0"
        )
        return s
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
    from azure_airbnb_cdc_ingestion_pipeline_spark.session import (
        get_spark,
        release_persisted,
    )

    spark = get_spark("task-audit")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    sf_dir = os.path.abspath(args.sf_dir)

    out: dict[str, dict] = {}
    for name in args.queries.split(","):
        name = name.strip()
        seen = _stage_ids(base)
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.time() - t0, 1)
        release_persisted()
        # r9: superseded shuffle files of the JUST-FINISHED query are only
        # reclaimed when ContextCleaner sees them unreachable — which
        # needs a JVM GC that never fires between back-to-back audit
        # queries. Without this, a 3-query sf100 audit ran the last query
        # against a disk half-filled by the first two's scratch (and died
        # silently behind the output pipe).
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        stages = [
            s
            for s in _get(f"{base}/stages")
            if s["stageId"] not in seen and s["status"] == "COMPLETE"
        ]
        rec = {
            "wall_sec": wall,
            "stages": len(stages),
            "max_task_input_mb": 0.0,
            "p50_task_input_mb": 0.0,
            "max_task_shuffle_read_mb": 0.0,
            "max_task_shuffle_write_mb": 0.0,
            "sum_disk_spill_mb": 0.0,
            "sum_memory_spill_mb": 0.0,
            "max_task_peak_exec_memory_mb": 0.0,
            "max_input_stage_id": None,
        }
        for s in stages:
            rec["sum_disk_spill_mb"] += s.get("diskBytesSpilled", 0) / MB
            rec["sum_memory_spill_mb"] += s.get("memoryBytesSpilled", 0) / MB
            summ = _summary(base, s["stageId"], s.get("attemptId", 0))
            if not summ:
                continue
            inp = summ.get("inputMetrics") or {}
            in_q = inp.get("bytesRead", [0, 0])
            if in_q and in_q[-1] / MB > rec["max_task_input_mb"]:
                rec["max_task_input_mb"] = in_q[-1] / MB
                rec["p50_task_input_mb"] = in_q[0] / MB
                rec["max_input_stage_id"] = s["stageId"]
            sr = (summ.get("shuffleReadMetrics") or {}).get(
                "readBytes", [0, 0]
            )
            sw = (summ.get("shuffleWriteMetrics") or {}).get(
                "writeBytes", [0, 0]
            )
            pm = summ.get("peakExecutionMemory", [0, 0])
            rec["max_task_shuffle_read_mb"] = max(
                rec["max_task_shuffle_read_mb"], (sr or [0])[-1] / MB
            )
            rec["max_task_shuffle_write_mb"] = max(
                rec["max_task_shuffle_write_mb"], (sw or [0])[-1] / MB
            )
            rec["max_task_peak_exec_memory_mb"] = max(
                rec["max_task_peak_exec_memory_mb"], (pm or [0])[-1] / MB
            )
        for k, v in rec.items():
            if isinstance(v, float):
                rec[k] = round(v, 1)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    result = {"sf_dir": sf_dir, "cpus": os.cpu_count(), "queries": out}
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"out": args.out, "n": len(out)}))


if __name__ == "__main__":
    main()
