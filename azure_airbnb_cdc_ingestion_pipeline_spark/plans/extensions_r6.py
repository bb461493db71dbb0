"""Round-6 charter extensions: distributed query-side ANN.

The existing exact-ANN kernels (`ann_cosine_topk`, `ann_numpy_topk`,
`pq_topk`) ship the query set to the tasks via the driver — correct by
contract for a bounded query set, but a real retrieval pipeline can
carry a query set as large as the corpus. `ann_blocked_topk` exercises
`operators.similarity.blocked_topk`: block-nested cogrouped GEMM, no
driver collect, per-task memory bounded by the two block knobs (the
oracle run forces a 4×3 block grid so the multi-block merge is what's
being hash-checked, not a degenerate single pair)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_BLOCKED_ANN_ORACLE = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 40),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos_sim
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
"""


@query("ann_blocked_topk", oracle=_BLOCKED_ANN_ORACLE)
def q_ann_blocked_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 over a 40-query set through the distributed blocked
    kernel. Block sizes are deliberately tiny here (10 queries / ~1/3 of
    the corpus per chunk) so the run crosses 12 block pairs and the
    global rank merge across corpus chunks is exercised; at scale the
    same code runs with executor-memory-sized blocks."""
    from ..operators.similarity import blocked_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nc = emb.count()
    out = blocked_topk(
        queries,
        emb,
        k=5,
        query_block_rows=10,
        corpus_block_rows=max(1, nc // 3 + 1),
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("cos").alias("cos_sim"),
        F.col("rank").alias("rnk"),
    )
