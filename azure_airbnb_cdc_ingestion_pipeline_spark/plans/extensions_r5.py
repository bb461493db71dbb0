"""Round-5 charter extensions: exact-oracle sketches (KMV distinct,
count-min frequency), Z-order layout clustering, deterministic random
projection, and weighted PageRank.

What this batch adds over the existing catalog:

- The existing sketch keys (`approx_quantile_bounded`,
  `heavy_hitters_gated`, `approx_distinct_bounded`) use *invariant*
  oracles — DuckDB certifies a tolerance/containment property. The two
  sketches here are **bit-exact cross-engine**: every hash derives from
  md5 (identical in both engines), so the oracle rebuilds the *same
  sketch* and the driver hash-compares actual estimates.
- `table_zorder_layout` is the data-LAYOUT operator class (Delta/Iceberg
  `OPTIMIZE ZORDER BY`) — at 100 TB, clustering is what makes min/max
  file skipping fire on more than one dimension.
- `graph_pagerank` joins `dedup_cluster_canonical` (connected
  components) to round out iterative graph analytics; the oracle is the
  same fixed-point unrolled as a 5-deep CTE chain.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.sketches import HASH_SPACE, countmin_estimates, kmv_distinct
from ..functions.zorder import zvalue, zvalue_sql
from ..operators.graph import copurchase_pagerank
from .queries import _t, query

# ---------------------------------------------------------------------------
# KMV distinct sketch — exact cross-engine oracle
# ---------------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
    WITH d AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 13))::BIGINT AS h
      FROM events
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY event_type) AS exact
      FROM d
    ),
    agg AS (
      SELECT event_type,
             max(exact) AS exact_distinct,
             CAST(coalesce(
               round({_KMV_K - 1}.0 * {int(HASH_SPACE)} /
                     max(CASE WHEN rn = {_KMV_K} THEN h END), 0),
               max(exact)) AS BIGINT) AS kmv_distinct
      FROM r GROUP BY event_type
    )
    SELECT event_type, exact_distinct, kmv_distinct,
           round(abs(kmv_distinct - exact_distinct) * 100.0
                 / exact_distinct, 2) AS rel_err_pct
    FROM agg
"""


@query("sketch_kmv_distinct", oracle=_KMV_ORACLE)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user estimate per event type,
    k=64, md5-hashed so DuckDB recomputes the IDENTICAL sketch (52-bit
    hashes are exact in doubles — the estimate matches to the last
    digit, not within a tolerance). Spark side prunes with a salted
    two-phase top-k window so no partition sorts a full group
    (functions/sketches.py::kmv_distinct)."""
    return kmv_distinct(
        _t(spark, sf_dir, "events"), "event_type", "user_id", k=_KMV_K
    )


# ---------------------------------------------------------------------------
# Count-min sketch — exact cross-engine oracle
# ---------------------------------------------------------------------------

_CM_ORACLE = """
    WITH v AS (SELECT user_id AS v FROM events),
    js AS (SELECT unnest(range(4)) AS j),
    sketch AS (
      SELECT j, ('0x' || substr(md5(j::VARCHAR || ':' || v::VARCHAR), 1, 13))::BIGINT % 512 AS bucket,
             count(*) AS cnt
      FROM v, js GROUP BY 1, 2
    ),
    cand AS (
      SELECT v, count(*) AS exact_cnt FROM v GROUP BY v
      ORDER BY exact_cnt DESC, v ASC LIMIT 20
    ),
    probe AS (
      SELECT c.v, c.exact_cnt, js.j,
             ('0x' || substr(md5(js.j::VARCHAR || ':' || c.v::VARCHAR), 1, 13))::BIGINT % 512 AS bucket
      FROM cand c, js
    ),
    est AS (
      SELECT p.v, p.exact_cnt, min(s.cnt) AS cm_est
      FROM probe p JOIN sketch s USING (j, bucket) GROUP BY 1, 2
    )
    SELECT v AS user_id, exact_cnt, cm_est,
           cm_est - exact_cnt AS overcount,
           cm_est >= exact_cnt AS is_overestimate
    FROM est
"""


@query("sketch_countmin_freq", oracle=_CM_ORACLE)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=512) event-count estimates for the 20
    heaviest users, md5-hashed for bit-exact oracle parity. The sketch
    is one mergeable groupBy (d*w bounded state); probes broadcast.
    `is_overestimate` certifies the CM one-sided error guarantee on
    every output row (functions/sketches.py::countmin_estimates)."""
    from ..session import fan_out

    # fan_out (r10): 4 md5 probes/row ran at the single-row-group scan
    # width; no-op at real scale
    return countmin_estimates(
        fan_out(_t(spark, sf_dir, "events")), "user_id", depth=4, width=512, top=20
    )


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

_Z_ORACLE = f"""
    WITH raw AS (
      SELECT o_custkey AS x,
             date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS y
      FROM orders
    ),
    ext AS (
      SELECT min(x) AS minx, max(x) - min(x) + 1 AS rngx,
             min(y) AS miny, max(y) - min(y) + 1 AS rngy
      FROM raw
    ),
    q AS (
      SELECT CAST(floor((x - minx) * 256.0 / rngx) AS BIGINT) AS xq,
             CAST(floor((y - miny) * 256.0 / rngy) AS BIGINT) AS yq
      FROM raw, ext
    ),
    z AS (SELECT xq, yq, {zvalue_sql('xq', 'yq', bits=8)} AS zval FROM q)
    SELECT zval >> 10 AS z_bucket,
           count(*) AS n_orders,
           min(xq) AS min_cust, max(xq) AS max_cust,
           min(yq) AS min_day, max(yq) AS max_day
    FROM z GROUP BY 1
"""


@query("table_zorder_layout", oracle=_Z_ORACLE)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of orders on (customer, order-day):
    min/max-quantize each dimension to 8 bits (domain-adaptive, so the
    layout works at every scale factor), interleave, bucket by the top
    6 z-bits (64 file-sized buckets), report per-bucket min/max stats —
    the exact stats a lakehouse writer would persist for file skipping.
    Bucket spans on BOTH dimensions shrink to ~1/8 of the global span,
    so a predicate on either dimension prunes ~7/8 of the files
    (locality asserted in tests/test_extensions_r5.py). Pure JVM bit
    arithmetic (functions/zorder.py); one tiny extent agg (broadcast) +
    one groupBy shuffle."""
    orders = _t(spark, sf_dir, "orders")
    raw = orders.select(
        F.col("o_custkey").cast("long").alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )
    ext = raw.agg(
        F.min("x").alias("minx"),
        (F.max("x") - F.min("x") + 1).alias("rngx"),
        F.min("y").alias("miny"),
        (F.max("y") - F.min("y") + 1).alias("rngy"),
    )
    q = raw.crossJoin(F.broadcast(ext)).select(
        F.floor((F.col("x") - F.col("minx")) * 256.0 / F.col("rngx")).alias("xq"),
        F.floor((F.col("y") - F.col("miny")) * 256.0 / F.col("rngy")).alias("yq"),
    )
    z = q.withColumn("zval", zvalue(F.col("xq"), F.col("yq"), bits=8))
    return z.groupBy(F.shiftright("zval", 10).alias("z_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("xq").alias("min_cust"),
        F.max("xq").alias("max_cust"),
        F.min("yq").alias("min_day"),
        F.max("yq").alias("max_day"),
    )


# ---------------------------------------------------------------------------
# Deterministic random projection (Achlioptas-style sign matrix)
# ---------------------------------------------------------------------------

_IN_DIM, _OUT_DIM = 64, 16


def _proj_signs() -> list[list[float]]:
    """±1 sign matrix [out_dim][in_dim] from md5("i_j") — reproducible
    from the formula alone in any engine/language."""
    return [
        [
            1.0 if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] < "8" else -1.0
            for i in range(_IN_DIM)
        ]
        for j in range(_OUT_DIM)
    ]


_SIGNS = _proj_signs()

_PROJ_ORACLE = "SELECT vec_id, " + ", ".join(
    f"round(list_dot_product(embedding::DOUBLE[], "
    f"[{', '.join(str(s) for s in row)}]::DOUBLE[]), 3) AS p{j:02d}"
    for j, row in enumerate(_SIGNS)
) + " FROM embeddings"


@query("embedding_random_projection", oracle=_PROJ_ORACLE)
def q_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64 -> 16 with a
    deterministic ±1 sign matrix (md5-derived, so the oracle embeds the
    identical literals). Map-only JVM fold (`zip_with` + `aggregate`)
    — no UDF, no shuffle; at 100 TB this is a pure scan-fused pass.
    Distance preservation within JL bounds is asserted in
    tests/test_extensions_r5.py."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    from ..functions.text import lit_array

    # lit_array (r10): the 16×64 sign matrix as per-element F.lit()
    # calls cost ~0.9 s of py4j driver chatter per query build; one
    # expr per row is ~30× cheaper, same DoubleType literals
    cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    "v",
                    lit_array(_SIGNS[j], "double"),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            3,
        ).alias(f"p{j:02d}")
        for j in range(_OUT_DIM)
    ]
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# Weighted PageRank over the co-purchase part graph
# ---------------------------------------------------------------------------

def _pagerank_oracle(iterations: int = 5) -> str:
    ctes = [
        """pairs AS (
          SELECT a.l_partkey AS s, b.l_partkey AS d, count(*)::DOUBLE AS w
          FROM lineitem a
          JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
        )""",
        "deg AS (SELECT s, sum(w) AS wsum FROM pairs GROUP BY s)",
        "norm AS (SELECT p.s, p.d, p.w / g.wsum AS pr FROM pairs p JOIN deg g USING (s))",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM deg)",
        "r0 AS (SELECT s AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
              SELECT nm.d AS node,
                     0.15 / (SELECT n FROM nn)
                     + 0.85 * sum(r{i - 1}.r * nm.pr) AS r
              FROM norm nm JOIN r{i - 1} ON r{i - 1}.node = nm.s
              GROUP BY nm.d
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT node AS part_key, round(r, 6) AS pagerank
        FROM r{iterations}
        QUALIFY row_number() OVER (ORDER BY round(r, 6) DESC, node ASC) <= 20
        """
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(
    spark: SparkSession, sf_dir: str, driver_rows: int = 2_000_000
) -> DataFrame:
    """Weighted PageRank (5 iterations, d=0.85) over the symmetric
    part co-purchase graph; top-20 parts. Edge build is keyed on
    l_orderkey (<= 7 lines/order — bounded pair fan-out); iterations
    are join-aggregate rounds against a persisted normalized edge list
    (operators/graph.py). Oracle = the same fixed-point unrolled as a
    5-deep CTE chain."""
    # Factored bipartite formulation: the co-purchase graph is a
    # two-hop projection whose |E| = Σ len(order)² outgrows the data
    # (720 M pairs from 180 M lineitem rows at sf30; 155 s build +
    # 12.9 GB agg spill on the pair path). copurchase_pagerank computes
    # the identical fixed point from per-order sums without ever
    # materializing a pair row — parity-tested against
    # pagerank(copurchase_edges(li)) and the same DuckDB oracle.
    ranks = copurchase_pagerank(
        _t(spark, sf_dir, "lineitem"),
        iterations=5,
        damping=0.85,
        driver_rows=driver_rows,
    )
    out = ranks.select(
        F.col("node").alias("part_key"), F.round("pagerank", 6).alias("pagerank")
    )
    return out.orderBy(F.col("pagerank").desc(), F.col("part_key").asc()).limit(20)


# ---------------------------------------------------------------------------
# KMV set operations (theta-sketch-style union / intersection estimates)
# ---------------------------------------------------------------------------

_SETOPS_K = 256

_SETOPS_ORACLE = f"""
    WITH lh AS (
      SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 13))::BIGINT AS h
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    ),
    rh AS (
      SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 13))::BIGINT AS h
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    ),
    ls AS (SELECT h FROM lh QUALIFY row_number() OVER (ORDER BY h) <= {_SETOPS_K}),
    rs AS (SELECT h FROM rh QUALIFY row_number() OVER (ORDER BY h) <= {_SETOPS_K}),
    us AS (
      SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM ls UNION ALL SELECT h FROM rs))
      QUALIFY row_number() OVER (ORDER BY h) <= {_SETOPS_K}
    ),
    est AS (
      SELECT
        (SELECT CAST(coalesce(round({_SETOPS_K - 1}.0 * {int(HASH_SPACE)} /
            max(CASE WHEN rn = {_SETOPS_K} THEN h END), 0), max(rn)) AS BIGINT)
         FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ls)) AS est_left,
        (SELECT CAST(coalesce(round({_SETOPS_K - 1}.0 * {int(HASH_SPACE)} /
            max(CASE WHEN rn = {_SETOPS_K} THEN h END), 0), max(rn)) AS BIGINT)
         FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM rs)) AS est_union_l,
        (SELECT CAST(coalesce(round({_SETOPS_K - 1}.0 * {int(HASH_SPACE)} /
            max(CASE WHEN rn = {_SETOPS_K} THEN h END), 0), max(rn)) AS BIGINT)
         FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM us)) AS est_union,
        (SELECT count(*) FROM us) AS ku,
        (SELECT count(*) FROM us
         WHERE h IN (SELECT h FROM ls) AND h IN (SELECT h FROM rs)) AS kboth
    )
    SELECT est_left, est_union_l AS est_right, est_union,
           CAST(round(est_union * kboth / ku, 0) AS BIGINT) AS est_intersection
    FROM est
"""


@query("sketch_kmv_setops", oracle=_SETOPS_ORACLE)
def q_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style set algebra from mergeable KMV sketches:
    distinct-user estimates for clickers, purchasers, their union
    (merge sketches, re-take k smallest) and intersection (fraction of
    union-sketch hashes present in both sides, scaled) — cardinality
    set operations WITHOUT co-shuffling the exact distinct sets. Each
    side reduces to <= k=256 rows before combining; bit-exact oracle
    (functions/sketches.py::kmv_set_ops)."""
    from ..functions.sketches import kmv_set_ops

    ev = _t(spark, sf_dir, "events")
    return kmv_set_ops(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "user_id",
        k=_SETOPS_K,
    )


# ---------------------------------------------------------------------------
# KMV quantile sketch (uniform minimum-hash row sample → order statistics)
# ---------------------------------------------------------------------------

_QSK_K = 256

_QUANTILE_SKETCH_ORACLE = f"""
    WITH hashed AS (
      SELECT event_type, value,
             ('0x' || substr(md5(event_id::VARCHAR), 1, 13))::BIGINT AS h
      FROM events
      WHERE value IS NOT NULL AND event_id IS NOT NULL
    ),
    samp AS (
      SELECT event_type, value, h FROM hashed
      QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h, value)
              <= {_QSK_K}
    ),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, h)
               AS vrn,
             count(*) OVER (PARTITION BY event_type) AS n_s
      FROM samp
    )
    SELECT event_type, CAST(max(n_s) AS BIGINT) AS n_sampled,
           max(CASE WHEN vrn = greatest(1, CAST(ceil(0.5 * n_s) AS BIGINT))
                    THEN value END) AS p50,
           max(CASE WHEN vrn = greatest(1, CAST(ceil(0.9 * n_s) AS BIGINT))
                    THEN value END) AS p90,
           max(CASE WHEN vrn = greatest(1, CAST(ceil(0.99 * n_s) AS BIGINT))
                    THEN value END) AS p99
    FROM ranked GROUP BY event_type
"""


@query("sketch_kmv_quantiles", oracle=_QUANTILE_SKETCH_ORACLE)
def q_sketch_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 of `value` from a k=256 minimum-hash
    uniform row sample — mergeable quantiles WITHOUT a per-group sort of
    the full data (union samples, re-take k smallest hashes; groups
    below k are exact). Bit-exact oracle from the shared md5 primitive
    (functions/sketches.py::kmv_quantiles); complements the exact
    `exact_median_rank` path the way `sketch_kmv_distinct` complements
    exact distinct counts."""
    from ..functions.sketches import kmv_quantiles

    return kmv_quantiles(
        _t(spark, sf_dir, "events"), "event_type", "event_id", "value", k=_QSK_K
    )


# ---------------------------------------------------------------------------
# Deterministic weighted reservoir sampling (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

_WRS_ORACLE = f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(pow(
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 1)
                 / {HASH_SPACE!r}::DOUBLE,
               1.0 / n_chars), 8) AS es_key
      FROM documents
    )
    SELECT doc_id, n_chars, es_key FROM keyed
    QUALIFY row_number() OVER (ORDER BY es_key DESC, doc_id ASC) <= 100
"""


@query("sample_weighted_reservoir", oracle=_WRS_ORACLE)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement:
    100 documents weighted by length, keys u^(1/w) with md5-uniform u —
    reproducible (no RNG), bit-exact oracle. Salted two-phase top-n, so
    no partition sorts the full corpus
    (functions/sketches.py::weighted_reservoir_sample)."""
    from ..functions.sketches import weighted_reservoir_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_reservoir_sample(docs, "doc_id", "n_chars", n=100)


# ---------------------------------------------------------------------------
# Relational breadth: time-weighted average, pivot / unpivot, CUBE
# ---------------------------------------------------------------------------

@query(
    "events_time_weighted_avg",
    # TWA over irregular samples: each observed value holds until the
    # next observation (zero-order hold); weight = seconds until the
    # next event of the same user. Users with one event have no held
    # interval -> excluded (matching both engines).
    oracle="""
    WITH seq AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    held AS (
      SELECT user_id,
             date_diff('microsecond', ts, nxt) / 1e6 AS dur,
             value
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           round(sum(dur * coalesce(value, 0.0)) / sum(dur), 4) AS twa_value,
           count(*) AS n_intervals
    FROM held GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregularly-sampled event values
    (zero-order hold — the standard sensor/price aggregation where a
    plain AVG over-weights bursts). One window shuffle keyed on
    user_id, then a hash agg; at 100 TB this partitions by entity and
    never sorts globally."""
    from pyspark.sql import Window as W_

    ev = _t(spark, sf_dir, "events")
    w = W_.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("ts").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    # timestampdiff keeps the duration integer-exact AND works on the
    # events table's TIMESTAMP_NTZ without a session-timezone-dependent
    # cast (unix_micros rejects NTZ; double-casting rounds at ~1e-7 s)
    held = seq.select(
        "user_id",
        (
            F.expr("timestampdiff(MICROSECOND, ts, nxt)") / F.lit(1e6)
        ).alias("dur"),
        F.coalesce("value", F.lit(0.0)).alias("v"),
    )
    return held.groupBy("user_id").agg(
        F.round(F.sum(F.col("dur") * F.col("v")) / F.sum("dur"), 4).alias(
            "twa_value"
        ),
        F.count(F.lit(1)).alias("n_intervals"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@query(
    "events_pivot_by_type",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup' THEN value ELSE 0 END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 2) AS "view"
    FROM events GROUP BY user_id
    """,
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long event stream → wide per-user value matrix via
    `groupBy().pivot(values=...)`. Passing the value list explicitly
    skips Spark's distinct-scan pre-pass (one aggregation instead of
    two jobs) — at scale the pivot column set must be known/bounded
    anyway, since it becomes the schema."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2))
    )
    # pivot cells with no rows are null; oracle's CASE yields 0.0
    return out.select(
        "user_id",
        *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t) for t in _EVENT_TYPES],
    )


@query(
    "events_unpivot_values",
    # UNPIVOT/melt of the per-user pivot back to long form, keeping only
    # non-zero cells — round-trips the pivot above.
    oracle="""
    WITH wide AS (
      SELECT user_id,
             round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, kind, amount FROM (
      SELECT user_id, 'click' AS kind, click AS amount FROM wide
      UNION ALL
      SELECT user_id, 'purchase' AS kind, purchase AS amount FROM wide
    ) WHERE amount <> 0
    """,
)
def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) via the native `DataFrame.unpivot` — wide columns
    back to (entity, kind, amount) long form; map-only after the
    aggregation, no shuffle added by the unpivot itself."""
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .agg(F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2))
        .select(
            "user_id",
            F.coalesce("click", F.lit(0.0)).alias("click"),
            F.coalesce("purchase", F.lit(0.0)).alias("purchase"),
        )
    )
    return wide.unpivot(
        "user_id", ["click", "purchase"], "kind", "amount"
    ).filter(F.col("amount") != 0)


@query(
    "grouping_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 aggregation levels in one pass —
    Catalyst expands to a single Expand + hash agg, not 4 scans);
    grouping-id column disambiguates coalesced NULL keys."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (
                F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")
            ).cast("long").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "sum_qty",
            "gid",
        )
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (compressed index + exact re-rank)
# ---------------------------------------------------------------------------

@query(
    "ann_pq_recall",
    # The planted-recall invariant (ann_lsh_recall / ann_int8_recall
    # pattern): each planted query's true nearest neighbor must survive
    # the PQ shortlist and win the exact re-rank, and the reported
    # cosine is the TRUE full-precision one.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, list_prepend(v[1] + 0.05, v[2:]) AS qv, v
          FROM e WHERE vec_id < 10)
    SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id,
           round(list_cosine_similarity(qv, v), 4) AS cos_sim
    FROM q
    """,
)
def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization search (Jégou et al. 2011): the corpus
    compressed to 8 one-byte codes/vector (64× smaller resident index),
    scanned with asymmetric-distance lookup tables, shortlist re-ranked
    at full precision. Codebooks are deterministic bounded-sample Lloyd
    iterations — no RNG (operators/similarity.py::pq_topk). Completes
    the quantized-ANN family next to int8: PQ is the memory-bound
    100 TB lever (codes + codebooks fit where fp vectors cannot)."""
    from ..operators.similarity import pq_topk
    from .extensions import _planted_queries

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(_planted_queries(emb), emb, dim=64, k=1)


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase graph
# ---------------------------------------------------------------------------

def _copurchase_pairs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (s < d) co-purchase pair STREAM over parts — one row per
    co-occurrence, duplicates included. Callers that can filter
    deterministically on (s, d) should do so on this frame BEFORE
    deduplicating: the distinct's exchange is the dominant cost (near-
    unique keys → no map-side reduction), and a map-side predicate
    shrinks it by the keep rate for an identical deduped result."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("s"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("d"))
    return a.join(b, "ok").filter(F.col("s") < F.col("d")).select("s", "d")


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (s < d) distinct co-purchase edges over parts."""
    return _copurchase_pairs_raw(spark, sf_dir).distinct()


def _triangles_per_edge(pairs: DataFrame, compact_ids: bool = False) -> DataFrame:
    """(s, d, tri) where tri = |F(s) ∩ F(d)| and F(x) = {y > x : edge} —
    each triangle x<y<z counted exactly once at its smallest edge (x,y).

    r6 reshape (sf10 disk kill): the classic wedge join e1⋈e2⋈e3
    MATERIALIZES every open wedge as a row — Σ_y in(y)·out(y) rows.
    This graph is dense-uniform (avg part degree ~120 at every sf, so
    wedges ≈ |V|·deg²/4: 49M at sf0.1, 493M at sf1, 4.9 BILLION at
    sf10 ≈ 120 GB of sort spill — the r6 scale run filled the disk).
    Degree-ordering doesn't help a uniform-degree graph. Instead the
    wedge set is never materialized: forward adjacency is aggregated
    ONCE into sorted arrays (|V| rows, avg-60-element arrays) and each
    edge computes its closed-wedge count with a JVM-side
    array_intersect.

    Second reshape (sf10→sf100 push): the first adjacency-intersect
    shape attached BOTH endpoint arrays edge-by-edge through two
    sort-merge joins, so the sorts moved O(|E|·deg) array payload —
    ~115 GB at sf10, a memory→disk cliff that measured 19× wall for
    10× data (compute is linear; the cliff is sort spill). Now the
    payload is never sorted: in-edges are grouped per HEAD node
    (narrow |E| shuffle of two ids), the head adjacency joins once per
    NODE (|V|-row join, arrays on both sides but node-level volume),
    the (s, d, nb_d) rows explode MAP-SIDE, and the single remaining
    per-edge attach of nb_s is a SHUFFLE_HASH join (build side = the
    |V|-row adjacency partition — a hash join streams the exploded
    payload without sorting it). Measured at sf10: 101 s → 41 s for
    the join phase, and the scaling ratio drops back under the
    superlinear flag line. Same exact result, same oracle.

    ``compact_ids`` stores the neighbor arrays as int32 (r10, shared
    with the chunked kernel): the arrays are the streamed payload, so
    half-width elements halve the attach-join volume; intersection
    counts are type-agnostic. Only valid when the caller proves the id
    domain fits int32 — the s/d key columns stay long either way."""
    nb_elem = F.col("d").cast("int") if compact_ids else F.col("d")
    adj = pairs.groupBy("s").agg(F.sort_array(F.collect_list(nb_elem)).alias("nb"))
    by_d = pairs.groupBy("d").agg(F.collect_list("s").alias("__ss"))
    node = by_d.join(
        adj.select(F.col("s").alias("d"), F.col("nb").alias("nb_d")), "d"
    )
    exploded = node.select("d", F.explode("__ss").alias("s"), "nb_d")
    return (
        exploded.join(adj.withColumnRenamed("nb", "nb_s").hint("shuffle_hash"), "s")
        .select(
            "s", "d", F.size(F.array_intersect("nb_s", "nb_d")).alias("tri")
        )
    )


def _triangles_summary_chunked(
    spark, pairs: DataFrame, chunks: int, compact_ids: bool = False
):
    """Exact (n_triangles, nodes_in_triangles) with BOUNDED scratch
    disk: the adjacency-intersect kernel's streamed side carries the
    per-edge forward-neighbor array — Σ|E|·deg bytes of shuffle
    (~170 GB raw at sf30), which is inherent to edge-wise intersection
    and filled this box's 55 GB scratch in one generation. Chunking the
    edge stream by hash(s) into ``chunks`` passes shuffles 1/chunks of
    the payload per pass; each pass reduces to two scalars (Σ tri,
    distinct smallest-nodes — disjoint across passes since every s
    lives in exactly one chunk), is materialized, and its shuffle
    generation is GC-reclaimed before the next pass starts. Same exact
    result; peak scratch = payload/chunks. On a real cluster this is
    how you trade wall-clock for per-executor scratch."""
    from ..operators.graph import _unpersist_after

    frames: list = []
    with _unpersist_after(frames):
        # localCheckpoint (not persist): the |V|-row adjacency layouts
        # are needed in every pass AND their pair-build lineage holds
        # ~12 GB of shuffle files — checkpointing cuts that lineage so
        # the build generation is reclaimable before the first pass
        # compact_ids: the streamed payload is the neighbor ARRAYS, so
        # when the caller proves the id domain fits int32 the arrays are
        # stored and shuffled at half width (intersection counts are
        # type-agnostic; the s/d KEY columns stay long)
        nb_elem = F.col("d").cast("int") if compact_ids else F.col("d")
        adj = (
            pairs.groupBy("s")
            .agg(F.sort_array(F.collect_list(nb_elem)).alias("nb"))
            .localCheckpoint(eager=True)
        )
        frames.append(adj)
        node = (
            pairs.groupBy("d")
            .agg(F.collect_list("s").alias("__ss"))
            .join(
                adj.select(F.col("s").alias("d"), F.col("nb").alias("nb_d")), "d"
            )
            .localCheckpoint(eager=True)
        )
        frames.append(node)
        spark.sparkContext._jvm.System.gc()  # reclaim the build shuffles
        tot_tri = 0
        tot_nodes = 0
        for c in range(chunks):
            ss_c = (
                F.filter(
                    "__ss", lambda x: F.pmod(F.hash(x), F.lit(chunks)) == c
                )
                if chunks > 1
                else F.col("__ss")
            )
            ex = node.select("d", F.explode(ss_c).alias("s"), "nb_d")
            per_edge = ex.join(
                adj.withColumnRenamed("nb", "nb_s").hint("shuffle_hash"), "s"
            ).select(
                "s", F.size(F.array_intersect("nb_s", "nb_d")).alias("tri")
            )
            row = per_edge.agg(
                F.sum("tri").cast("long").alias("t"),
                F.countDistinct(
                    F.when(F.col("tri") > 0, F.col("s"))
                ).alias("nx"),
            ).first()
            tot_tri += row.t or 0
            tot_nodes += row.nx or 0
            # superseded pass shuffles are only reclaimed on a JVM GC
            spark.sparkContext._jvm.System.gc()
        return spark.createDataFrame(
            [(tot_tri, tot_nodes)],
            "n_triangles long, nodes_in_triangles long",
        )


@query(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.s AS x, e1.d AS y, e2.d AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.s = e1.d
      JOIN pairs e3 ON e3.s = e1.s AND e3.d = e2.d
    )
    SELECT count(*) AS n_triangles,
           count(DISTINCT x) AS nodes_in_triangles
    FROM tri
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting (the clustering-coefficient kernel) over
    the part co-purchase graph via adjacency-array intersection — see
    `_triangles_per_edge` for why the wedge join was retired.

    Runs eagerly inside a sized-shuffle window: the oriented-pair
    dedup aggregates NEAR-UNIQUE keys (~2 lineitem rows per distinct
    edge), so its map-side hash maps must be sized to the pair volume,
    not the session default (the doulion sibling measured 12.9 GB of
    aggregate spill at sf30 on 32 partitions). rows×2 ≈ the oriented
    pair count; the 1-row result is checkpointed before the window
    closes so the caller's collect replays nothing."""
    from ..operators.graph import sized_shuffle

    li = _t(spark, sf_dir, "lineitem")
    n = li.count()
    if n <= 30_000_000:
        # session defaults are right below the spill regime; lazy plan
        per_edge = _triangles_per_edge(_copurchase_pairs(spark, sf_dir))
        return per_edge.agg(
            F.sum("tri").cast("long").alias("n_triangles"),
            F.countDistinct(F.when(F.col("tri") > 0, F.col("s"))).alias(
                "nodes_in_triangles"
            ),
        )
    # scratch budget: the edge-wise payload is ~(2n pairs)·(deg≈60)
    # neighbor-array elements — 8 B each, halved to int32 when the id
    # domain allows (TPC-H part keys fit far below 2^31 at any tested
    # sf). Chunk passes to ~8 GB of POST-COMPRESSION shuffle each
    # (≈ 2× lz4 on sorted arrays) so one in-flight generation plus one
    # GC-lagged predecessor never fills the local disks (sf30 measured
    # the unchunked join dying on No-space at ~57 GB; 3 chunks still
    # peaked over the 55 GB free).
    max_pk = li.agg(F.max("l_partkey")).first()[0] or 0
    compact = max_pk < 2**31
    per_row = 240 if compact else 480
    chunks = min(64, max(1, -(-(n * per_row) // 8_000_000_000)))
    with sized_shuffle(spark, n * 2):
        return _triangles_summary_chunked(
            spark, _copurchase_pairs(spark, sf_dir), chunks, compact_ids=compact
        )


# ---------------------------------------------------------------------------
# Window-analytics suite (lag / lead / ntile / percent_rank / cume_dist)
# ---------------------------------------------------------------------------

@query(
    "window_analytics_suite",
    oracle="""
    SELECT event_id, user_id,
           round(coalesce(lag(value) OVER w, 0.0), 4) AS prev_value,
           round(coalesce(lead(value) OVER w, 0.0), 4) AS next_value,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ordered-analytics surface over one entity-keyed window —
    lag/lead (neighbor context), ntile (equi-depth bucketing),
    percent_rank/cume_dist (empirical CDF). ONE window spec → ONE sort
    within one shuffle; Catalyst evaluates all five functions in a
    single Window physical node (plan-asserted single exchange)."""
    from pyspark.sql import Window as W_

    ev = _t(spark, sf_dir, "events")
    w = W_.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4).alias(
            "prev_value"
        ),
        F.round(F.coalesce(F.lead("value").over(w), F.lit(0.0)), 4).alias(
            "next_value"
        ),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


# ---------------------------------------------------------------------------
# Interval coverage (gaps-and-islands union of overlapping intervals)
# ---------------------------------------------------------------------------

@query(
    "interval_coverage",
    # Each event opens a 30-minute activity interval; overlapping
    # intervals merge into islands; per user: islands + total covered
    # seconds (double-counting overlap would inflate it — the point of
    # the merge).
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e) AS island
      FROM marked
    ),
    merged AS (
      SELECT user_id, island, min(s) AS s0, max(e) AS e1
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           count(*) AS n_islands,
           CAST(sum(date_diff('microsecond', s0, e1) // 1000000) AS BIGINT)
             AS covered_seconds
    FROM merged GROUP BY user_id
    """,
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping per-user activity intervals (gaps-and-
    islands): an island starts where an interval begins after the
    running max of prior ends; covered time sums island spans — the
    dedup that makes utilization metrics correct. One window pass over
    one user-keyed shuffle, then a hash agg; no self-join."""
    from pyspark.sql import Window as W_

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    w = (
        W_.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W_.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(w), 1).otherwise(0),
    )
    w2 = W_.partitionBy("user_id").orderBy("s", "e")
    islands = marked.withColumn("island", F.sum("new_island").over(w2))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    # whole-second floor of the exact µs span, matching the oracle's
    # `date_diff('microsecond') // 1e6` (DuckDB's date_diff('second')
    # counts BOUNDARY crossings, not elapsed seconds — off by one for
    # sub-second phases)
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.expr("timestampdiff(MICROSECOND, s0, e1) div 1000000"))
        .cast("long")
        .alias("covered_seconds"),
    )


# ---------------------------------------------------------------------------
# Streaming KMV sketch (mergeable sketch state across micro-batches)
# ---------------------------------------------------------------------------

@query(
    "stream_kmv_distinct",
    # EXACT oracle, not a tolerance gate: KMV merge is associative and
    # lossless for the k-smallest set, so the estimate after N
    # micro-batches is bit-identical to the batch sketch over the same
    # rows. DuckDB rebuilds that batch sketch.
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 13))::BIGINT AS h
      FROM events
    ),
    r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn, count(*) OVER () AS exact FROM d)
    SELECT CAST(coalesce(
             round(63.0 * {int(HASH_SPACE)} / max(CASE WHEN rn = 64 THEN h END), 0),
             max(exact)) AS BIGINT) AS kmv_distinct,
           TRUE AS merged_across_batches
    FROM r
    """,
)
def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count sketch: the event stream drains through
    `foreachBatch`, each micro-batch reduces to its k=64 smallest
    distinct md5 hashes (a full KMV sketch), and the driver merges
    sketches across batches — O(k) state total, the mergeability that
    makes KMV the streaming/distributed cardinality shape. Because the
    merge is lossless for the k-minimum set, the final estimate is
    BIT-IDENTICAL to the batch sketch, so the oracle is exact (unique
    among the streaming keys, which otherwise need coverage gates)."""
    from .extensions import _events_stream
    from ..functions.sketches import HASH_SPACE as _HS, md5_hash52

    k = 64
    merged: list[int] = []

    def _merge_batch(batch_df, _bid):
        hs = (
            batch_df.select(md5_hash52(F.col("user_id")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
            .collect()
        )
        s = sorted(set(merged) | {r.h for r in hs})
        merged[:] = s[:k]

    stream = _events_stream(spark, sf_dir).select("user_id")
    # Deterministic checkpoint path (r6 advisor): Python str hash is
    # PYTHONHASHSEED-randomized per process, so abs(hash(sf_dir)) left
    # unmatched orphan dirs after crashed runs. An md5 digest makes the
    # path stable across processes — a crashed run's dir is REUSED (and
    # then removed) by the next run on the same sf_dir; try/finally
    # guarantees cleanup even when the drain raises.
    import hashlib
    import shutil

    ckpt = f"/tmp/stream_kmv_ckpt_{hashlib.md5(sf_dir.encode()).hexdigest()[:16]}"
    shutil.rmtree(ckpt, ignore_errors=True)  # stale state would skip batches
    try:
        q = (
            stream.writeStream.foreachBatch(_merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(180)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    import math

    if len(merged) >= k:
        # floor(x+0.5) = round-half-away-from-zero for positives — the
        # DuckDB/Spark round() convention (Python round() is half-even)
        est = int(math.floor((k - 1) * _HS / merged[k - 1] + 0.5))
    else:
        est = len(merged)  # exact below k (no hash lost before k fills)
    return spark.createDataFrame(
        [(est, True)], "kmv_distinct long, merged_across_batches boolean"
    )


# ---------------------------------------------------------------------------
# Data-quality expectation suite (single-pass rule evaluation)
# ---------------------------------------------------------------------------

@query(
    "dq_expectations",
    oracle="""
    WITH t AS (SELECT count(*) AS total FROM orders)
    SELECT r.rule, r.violations, t.total,
           round(1.0 - r.violations * 1.0 / t.total, 4) AS pass_rate
    FROM (
      SELECT 'orderkey_not_null' AS rule,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
      FROM orders
      UNION ALL
      SELECT 'totalprice_positive',
             CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'status_in_domain',
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orderdate_in_range',
             CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                        OR o_orderdate > TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orderkey_unique',
             (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
    ) r, t
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite — the batch contract check a
    pipeline runs before publishing a table (the generalization of the
    reference's rejected-rows split, dataflow/…:31-34): null checks,
    range checks, domain membership, and key uniqueness, ALL evaluated
    in one aggregation pass (conditional sums — no per-rule scans; the
    uniqueness rule reuses the same scan via count-distinct). Output:
    (rule, violations, total, pass_rate)."""
    from ..operators.dq import evaluate_expectations

    o = _t(spark, sf_dir, "orders")
    rules = [
        ("orderkey_not_null", F.col("o_orderkey").isNull()),
        (
            "totalprice_positive",
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
        ),
        ("status_in_domain", ~F.col("o_orderstatus").isin("O", "F", "P")),
        (
            "orderdate_in_range",
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp_ntz"))
            | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp_ntz")),
        ),
    ]
    return evaluate_expectations(
        o, rules, unique_key="o_orderkey", unique_rule_name="orderkey_unique"
    )


# ---------------------------------------------------------------------------
# Audio spectral analysis (real WAV decode + FFT under an exact oracle)
# ---------------------------------------------------------------------------

_AU_N, _AU_SR, _AU_AMP = 1024, 8000, 16000

_AUDIO_ORACLE = f"""
    WITH k AS (SELECT doc_id, 10 + doc_id % 50 AS k FROM documents),
    rms AS (
      SELECT doc_id, k,
             sqrt(list_sum(list_transform(range({_AU_N}),
               t -> CAST(((t * k % {_AU_N}) * 2 * {_AU_AMP} // {_AU_N} - {_AU_AMP})
                    * ((t * k % {_AU_N}) * 2 * {_AU_AMP} // {_AU_N} - {_AU_AMP}) AS DOUBLE)))
               / {_AU_N}) / 32768.0 AS r
      FROM k
    )
    SELECT doc_id AS media_id,
           {_AU_SR} AS sample_rate,
           {_AU_N} AS n_samples,
           CAST(k AS BIGINT) AS dominant_bin,
           k * {_AU_SR}.0 / {_AU_N} AS dominant_freq_hz,
           round(r, 4) AS rms
    FROM rms
"""


@query("audio_spectral_features", oracle=_AUDIO_ORACLE)
def q_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio DSP under an exact oracle: synthesize a 16-bit PCM WAV
    per document (sawtooth at bin k = 10 + doc%50 — INTEGER-exact
    formula, so the oracle regenerates identical samples in SQL),
    decode it back with the stdlib `wave` codec, then numpy rFFT →
    dominant non-DC bin + RMS. The FFT runs on actually-decoded bytes;
    the oracle predicts the dominant bin analytically (sawtooth
    fundamental) and recomputes RMS from the same integer samples.
    Arrow `mapInPandas` end-to-end — payload bytes never shuffle; at
    100 TB this is the feature-extract stage of an audio corpus scan."""
    import io as _io
    import wave as _wave

    import numpy as _np
    import pandas as _pd

    from ..functions.codecs import encode_wav
    from ..session import fan_out

    # fan_out (r10): the WAV synth+decode+rFFT pass ran as ONE task on
    # the single-row-group scan (1.2 s serialized at sf0.1); no-op at
    # real scale
    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id"))

    def _synth_and_analyze(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                k = 10 + did % 50
                t = _np.arange(_AU_N, dtype=_np.int64)
                s = (t * k % _AU_N) * 2 * _AU_AMP // _AU_N - _AU_AMP
                payload = encode_wav([int(v) for v in s], sample_rate=_AU_SR)
                # decode through the real codec path
                with _wave.open(_io.BytesIO(payload), "rb") as wf:
                    sr = wf.getframerate()
                    n = wf.getnframes()
                    raw = _np.frombuffer(
                        wf.readframes(n), dtype="<i2"
                    ).astype(_np.float64)
                spec = _np.abs(_np.fft.rfft(raw / 32768.0))
                dom = int(_np.argmax(spec[1:]) + 1)  # exclude DC
                rms = float(_np.sqrt(_np.mean((raw / 32768.0) ** 2)))
                out.append((did, sr, n, dom, dom * _AU_SR / _AU_N, round(rms, 4)))
            yield _pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "dominant_bin",
                    "dominant_freq_hz",
                    "rms",
                ],
            )

    return docs.mapInPandas(
        _synth_and_analyze,
        "media_id long, sample_rate int, n_samples int, dominant_bin long, "
        "dominant_freq_hz double, rms double",
    )


# ---------------------------------------------------------------------------
# Streaming exactly-once dedup (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

@query("stream_dropdup_watermark")  # streaming — rows-only check
def q_stream_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: a duplicate-injected event stream (every
    10th event arrives twice — deterministic) deduped on event_id via
    `dropDuplicatesWithinWatermark`, the bounded-state streaming dedup
    (keys expire once the watermark passes — at 100 TB the state store
    holds one watermark-width of keys, not the full history)."""
    from .extensions import _events_stream

    stream = _events_stream(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dup = (
        stream.withColumn(
            "_copies",
            F.when(
                F.col("event_id") % 10 == 0, F.array(F.lit(0), F.lit(1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_c", F.explode("_copies"))
        .drop("_copies", "_c")
    )
    deduped = dup.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    qname = "stream_dropdup_sink"
    q = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(qname)


@query(
    "stream_dropdup_coverage",
    # Invariant oracle (stream_tumbling_coverage pattern): the deduped
    # stream must emit EXACTLY the original distinct event set — the
    # injected duplicates vanish, nothing else does. Per-type counts are
    # timezone-free.
    oracle="""
    SELECT event_type, count(DISTINCT event_id) AS n_events, TRUE AS exact_once
    FROM events GROUP BY event_type
    """,
)
def q_stream_dropdup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage gate over the streaming dedup: per-type emitted counts
    equal the batch distinct-event counts — certifies the injected
    duplicates were dropped and no original event was lost."""
    out = q_stream_dropdup(spark, sf_dir)
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("exact_once", F.lit(True))
    )
