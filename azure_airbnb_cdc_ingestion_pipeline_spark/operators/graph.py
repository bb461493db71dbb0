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


#: Rank rows are (long node, double r) — ~32 bytes each in a broadcast
#: hash relation. 10 MiB (Spark's autoBroadcastJoinThreshold default)
#: / 32 B ≈ 300 k nodes; stay comfortably under it.
_BROADCAST_NODE_LIMIT = 250_000

#: Re-root the rank lineage every few iterations: each round appends a
#: join+agg to the plan, and past ~8 rounds analysis/codegen time and
#: the shuffle-reuse map grow without bound.
_CHECKPOINT_EVERY = 4


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 5,
    damping: float = 0.85,
    check_dangling: bool = True,
) -> DataFrame:
    """Weighted PageRank over an edge list with no dangling nodes
    (every node has at least one out-edge — true for symmetrized
    graphs). Returns (node, pagerank) for every node.

    The no-dangling precondition is ENFORCED (one anti-join count up
    front, same cost class as the degree scan): a node appearing as dst
    but never as src would silently leak rank mass every iteration, so
    we raise instead of returning quietly-wrong ranks. Pass
    ``check_dangling=False`` only when the caller has symmetrized the
    graph itself.

    The per-iteration rank broadcast is size-gated on |V|: a broadcast
    *hint* is not adaptive — Spark will attempt it at any size and OOM
    the driver past the broadcast limit — so beyond
    ``_BROADCAST_NODE_LIMIT`` nodes the hint is dropped and each
    iteration is a shuffled hash join against the persisted,
    pre-partitioned edge frame (both branches plan-asserted in
    tests/test_plan_assertions.py)."""
    # edges/deg are consumed by several jobs (degree scan, norm join,
    # rank init) but are NOT persisted deliberately: both end in a
    # shuffle, so cross-job shuffle-file reuse already serves repeat
    # consumers — an explicit cache was measured 1.5x SLOWER (pure
    # materialization overhead) at sf0.1.
    deg = edges.groupBy(src).agg(F.sum(weight).alias("_wsum"))
    if check_dangling:
        dangling = (
            edges.select(F.col(dst).alias("_n"))
            .distinct()
            .join(deg.select(F.col(src).alias("_n")), "_n", "left_anti")
            .count()
        )
        if dangling:
            raise ValueError(
                f"pagerank: {dangling} dangling node(s) (appear as {dst} "
                f"but have no out-edge) — rank mass would be lost. "
                f"Symmetrize the graph or pass check_dangling=False."
            )
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
    small = n <= _BROADCAST_NODE_LIMIT
    ranks = deg.select(F.col(src).alias("node"), F.lit(1.0 / n).alias("r"))
    for it in range(iterations):
        # ranks is O(|V|): below the gate, broadcast it so each
        # iteration's probe is a map-side hash join over the persisted
        # edge partitions (only shuffle per round = the partial-agged
        # groupBy on dst); above it, let the shuffled join stand.
        probe = F.broadcast(ranks) if small else ranks
        ranks = (
            norm.join(probe, norm["_s"] == probe["node"])
            .groupBy("_d")
            .agg(F.sum(F.col("r") * F.col("_p")).alias("_in"))
            .select(
                F.col("_d").alias("node"),
                (F.lit((1.0 - damping) / n) + damping * F.col("_in")).alias("r"),
            )
        )
        if (
            iterations > _CHECKPOINT_EVERY + 1
            and (it + 1) % _CHECKPOINT_EVERY == 0
            and it + 1 < iterations
        ):
            ranks = ranks.localCheckpoint(eager=True)
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
