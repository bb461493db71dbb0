"""One-off diagnostic: phase-level timing + I/O/spill for the FACTORED
copurchase pagerank at a given sf dir — mirrors
operators/graph.py::copurchase_pagerank with a phase probe around every
materialization so the expensive stage is attributable."""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(app_name="diag-pagerank")
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


lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
ok, pk = "l_orderkey", "l_partkey"
nrows = phase("lineitem_count", lambda: lineitem.count())
p_n = min(4096, max(sc.defaultParallelism, -(-nrows // 3_000_000)))
print(f"  rows = {nrows}  p_n = {p_n}", flush=True)
spark.conf.set("spark.sql.shuffle.partitions", str(p_n))
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

occ = lineitem.groupBy(ok, pk).agg(F.count(F.lit(1)).alias("_m"))
sz = occ.groupBy(ok).agg(F.sum("_m").alias("_sz"))
base = occ.join(sz.hint("shuffle_hash"), ok)
deg = (
    base.groupBy(pk)
    .agg(F.sum(F.col("_m") * (F.col("_sz") - F.col("_m"))).alias("_deg"))
    .filter(F.col("_deg") > 0)
    .persist(StorageLevel.MEMORY_AND_DISK)
)
li = (
    base.join(deg.hint("shuffle_hash"), pk)
    .select(
        F.col(ok).alias("_o"),
        F.col(pk).alias("_p"),
        F.col("_m").cast("double").alias("_mm"),
        (F.col("_m") / F.col("_deg")).alias("_md"),
    )
    .persist(StorageLevel.MEMORY_AND_DISK)
)
n = phase("deg_count", lambda: deg.count())
print(f"  nodes = {n}", flush=True)
cnt = phase("li_materialize", lambda: li.count())
print(f"  li rows = {cnt}", flush=True)

ranks = deg.select(F.col(pk).alias("node"), F.lit(1.0 / n).alias("r"))
for it in range(ITERS):
    lx = li.join(ranks.hint("shuffle_hash"), li["_p"] == ranks["node"]).select(
        "_o", "_p", "_mm", "_md", "r"
    )
    t = lx.groupBy("_o").agg(F.sum(F.col("_md") * F.col("r")).alias("_t"))
    nxt = (
        lx.join(t.hint("shuffle_hash"), "_o")
        .select(
            F.col("_p"),
            (F.col("_mm") * (F.col("_t") - F.col("_md") * F.col("r"))).alias("_c"),
        )
        .groupBy("_p")
        .agg(F.sum("_c").alias("_in"))
        .select(
            F.col("_p").alias("node"),
            (F.lit(0.15 / n) + 0.85 * F.col("_in")).alias("r"),
        )
    )
    if it == 0:
        nxt.explain("formatted")
    ranks = phase(f"iter_{it}", lambda: nxt.localCheckpoint(eager=True))
    phase(f"gc_{it}", lambda: sc._jvm.System.gc())

print("TOTAL io:", io(), flush=True)
spark.stop()
