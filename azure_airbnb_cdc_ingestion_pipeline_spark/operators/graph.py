"""Graph operators over DataFrames: weighted PageRank (charter
extension; complements the connected-components min-label propagation in
`plans/extensions.py::dedup_cluster_canonical`).

PageRank as iterated join-aggregate — the standard Pregel-free Spark
formulation: ranks live in a (node, r) frame that is tiny relative to
the edge list; each iteration is one shuffle (edges ⋈ ranks on src,
re-aggregated on dst). Edges are normalized once (w / out-degree) and
persisted, so per-iteration work is O(|E|) with no recomputation of the
edge-building join. Deterministic: fixed iteration count, no RNG;
ordering ties broken by node id.

100 TB posture: the rank frame is O(|V|) and shuffles by key; edges are
the big side and are hash-partitioned by src once — the iteration
re-uses that partitioning for the probe side each round. No
driver-side state beyond the single node-count scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over an edge list with no dangling nodes
    (every node has at least one out-edge — true for symmetrized
    graphs). Returns (node, pagerank) for every node."""
    deg = edges.groupBy(src).agg(F.sum(weight).alias("_wsum"))
    norm = (
        edges.join(deg, src)
        .select(
            F.col(src).alias("_s"),
            F.col(dst).alias("_d"),
            (F.col(weight) / F.col("_wsum")).alias("_p"),
        )
        .repartition("_s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = deg.count()  # single scalar — bounded driver state
    ranks = deg.select(F.col(src).alias("node"), F.lit(1.0 / n).alias("r"))
    for _ in range(iterations):
        # ranks is O(|V|) — broadcast it so each iteration's probe is a
        # map-side hash join over the persisted edge partitions; the only
        # shuffle per round is the partial-aggregated groupBy on dst.
        # (At |V| beyond broadcast size, drop the hint and this becomes
        # the shuffled-ranks formulation automatically.)
        ranks = (
            norm.join(F.broadcast(ranks), norm["_s"] == ranks["node"])
            .groupBy("_d")
            .agg(F.sum(F.col("r") * F.col("_p")).alias("_in"))
            .select(
                F.col("_d").alias("node"),
                (F.lit((1.0 - damping) / n) + damping * F.col("_in")).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric co-purchase part graph: parts sharing an order are
    linked, weighted by co-occurrence count. The self-join is keyed on
    l_orderkey (bounded fan-out: TPC-H orders hold <= 7 lines, so pair
    expansion is a small constant per order — never all-pairs)."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
