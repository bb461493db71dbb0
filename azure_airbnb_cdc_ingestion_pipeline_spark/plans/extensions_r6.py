"""Round-6 charter extensions: distributed query-side ANN + sampled
triangle counting.

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


# DOULION edge-sampled triangle estimate (Tsourakakis et al. 2009):
# keep each edge with probability p, count triangles on the sample,
# scale by 1/p³. Here the "coin" is an md5 hash of the edge key — fully
# deterministic and REPLICATED BIT-EXACTLY by the DuckDB oracle (the
# repo's bit-exact-sketch pattern, extensions_r5 KMV), so the key is
# hash-gated with NO tolerance band. Exact triangle work is inherently
# the wedge count (≈|V|·deg²/4 — 4.9B at sf10 on this dense-uniform
# graph); at p=0.3 the sampled wedge work is p²≈9% of that, which is
# what makes sf10+ tractable per box. Relative std ≈ √((p⁻³−1)/T) —
# ~1% at sf0.01's 414k triangles, shrinking with scale.
_TRI_KEEP = 300  # permille: p = 0.3

_DOULION_ORACLE = f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
    ),
    sampled AS (
      SELECT s, d FROM pairs
      WHERE ('0x' || substr(md5(s::VARCHAR || '-' || d::VARCHAR), 1, 13))::BIGINT
            % 1000 < {_TRI_KEEP}
    ),
    tri AS (
      SELECT e1.s AS x
      FROM sampled e1
      JOIN sampled e2 ON e2.s = e1.d
      JOIN sampled e3 ON e3.s = e1.s AND e3.d = e2.d
    )
    SELECT CAST(floor(count(*) * 1000.0 * 1000.0 * 1000.0
                / ({_TRI_KEEP} * {_TRI_KEEP} * {_TRI_KEEP}) + 0.5) AS BIGINT)
             AS est_triangles,
           CAST(count(*) AS BIGINT) AS sampled_triangles,
           {_TRI_KEEP} AS keep_permille
    FROM tri
"""


@query("graph_triangle_doulion", oracle=_DOULION_ORACLE)
def q_graph_triangle_doulion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION sampled triangle count — the 100 TB path for dense
    co-occurrence graphs where exact counting's wedge work is
    prohibitive. Deterministic md5 edge sampling (bit-exact vs the
    DuckDB oracle); the triangle kernel on the sample reuses the
    adjacency-intersection shape (`extensions_r5._triangles_per_edge`),
    so sampled work is p² of exact with the same spill-safe plan."""
    from ..functions.sketches import md5_hash52
    from .extensions_r5 import _copurchase_pairs, _triangles_per_edge

    pairs = _copurchase_pairs(spark, sf_dir)
    sampled = pairs.filter(
        F.pmod(
            md5_hash52(
                F.concat(
                    F.col("s").cast("string"), F.lit("-"), F.col("d").cast("string")
                )
            ),
            F.lit(1000),
        )
        < _TRI_KEEP
    )
    per_edge = _triangles_per_edge(sampled)
    scale = 1000.0**3 / float(_TRI_KEEP) ** 3
    return per_edge.agg(
        F.floor(F.sum("tri") * F.lit(scale) + F.lit(0.5))
        .cast("long")
        .alias("est_triangles"),
        F.sum("tri").cast("long").alias("sampled_triangles"),
        F.lit(_TRI_KEEP).alias("keep_permille"),
    )


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
