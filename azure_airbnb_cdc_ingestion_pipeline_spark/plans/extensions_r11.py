"""Round-11 catalog additions: forced-DISTRIBUTED twins of the five
driver-dispatch kernels (VERDICT r10 task #2).

The r10 size dispatches (pagerank, doulion, exact median, multi-metric
ntile, cluster-pairs CC) made the sf0.1 bench measure their numpy driver
kernels — legitimately faster there, but it left the distributed paths
(the ones that own every real scale) with no round-gate coverage: a
regression in the distributed twin would be invisible until someone
re-ran a scale leg by hand.

Each ``*_dist`` query runs the SAME query with the driver gate forced
off (gate = 0), so the distributed plan executes at every SF and rides
the bench + oracle like any other declared query. Results are identical
by the dispatch parity contract (each pair shares one oracle SQL), so
these keys double as standing parity proof driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .extensions import _CLUSTER_ORACLE, q_dedup_cluster
from .extensions_r5 import _pagerank_oracle, q_graph_pagerank
from .extensions_r6 import (
    _DOULION_ORACLE,
    _MEDIAN_ORACLE,
    _RFM_ORACLE,
    q_exact_median_rank,
    q_graph_triangle_doulion,
    q_rfm_segments,
)
from .queries import query


@query("graph_pagerank_dist", oracle=_pagerank_oracle())
def q_graph_pagerank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_graph_pagerank(spark, sf_dir, driver_rows=0)


@query("graph_triangle_doulion_dist", oracle=_DOULION_ORACLE)
def q_graph_triangle_doulion_dist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return q_graph_triangle_doulion(spark, sf_dir, driver_gate=0)


@query("exact_median_rank_dist", oracle=_MEDIAN_ORACLE)
def q_exact_median_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_exact_median_rank(spark, sf_dir, driver_gate=0)


@query("rfm_segments_dist", oracle=_RFM_ORACLE)
def q_rfm_segments_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_rfm_segments(spark, sf_dir, ntile_driver_limit=0)


@query("dedup_cluster_canonical_dist", oracle=_CLUSTER_ORACLE)
def q_dedup_cluster_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_dedup_cluster(spark, sf_dir, cc_driver_limit=0)
