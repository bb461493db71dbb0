"""One-off diagnostic: phase-level timing + I/O/spill for the DOULION
triangle estimate at a given sf dir. Phases: (a) sampled distinct edge
count, (b) forward-adjacency build, (c) full estimate."""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark
from azure_airbnb_cdc_ingestion_pipeline_spark.plans.extensions_r6 import (
    q_graph_triangle_doulion,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.plans.extensions_r5 import (
    _copurchase_pairs,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.functions.sketches import md5_hash52

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"

spark = get_spark(app_name="diag-triangles")
sc = spark.sparkContext


def io():
    ui = sc.uiWebUrl
    app = sc.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=5
        ) as r:
            stages = json.load(r)
    except Exception:
        return {k: 0.0 for k in ("shuffle_read", "shuffle_write", "input", "mem_spill", "disk_spill")}
    out = {"shuffle_read": 0.0, "shuffle_write": 0.0, "input": 0.0,
           "mem_spill": 0.0, "disk_spill": 0.0}
    for s in stages:
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["input"] += s.get("inputBytes", 0)
        out["mem_spill"] += s.get("memoryBytesSpilled", 0)
        out["disk_spill"] += s.get("diskBytesSpilled", 0)
    return {k: round(v / 1e6, 1) for k, v in out.items()}


def phase(name, fn):
    before = io()
    t0 = time.time()
    res = fn()
    dt = time.time() - t0
    after = io()
    delta = {k: round(after[k] - before[k], 1) for k in after}
    print(f"PHASE {name}: {dt:.1f}s io_delta_mb={delta}", flush=True)
    return res


pairs = _copurchase_pairs(spark, SF_DIR)
sampled = pairs.filter(
    F.pmod(
        md5_hash52(F.concat(F.col("s").cast("string"), F.lit("-"), F.col("d").cast("string"))),
        F.lit(1000),
    )
    < 300
)
n = phase("sampled_distinct", lambda: sampled.count())
print(f"  sampled edges = {n}", flush=True)
adj = sampled.groupBy("s").agg(F.sort_array(F.collect_list("d")).alias("nb"))
na = phase("adj_build", lambda: adj.count())
print(f"  adj nodes = {na}", flush=True)
res = phase("full_query", lambda: q_graph_triangle_doulion(spark, SF_DIR).collect())
print(f"  result = {res}", flush=True)
print("TOTAL io:", io(), flush=True)
spark.stop()
