"""Mergeable cardinality / frequency sketches with EXACT cross-engine
oracles (charter extension; complements the invariant-gated
`approx_quantile_bounded` / `heavy_hitters_gated` family).

Both sketches derive every hash from ``md5`` — available bit-identically
in Spark (`F.md5` + `F.conv`) and DuckDB (`md5` + hex-string cast) — so
the oracle recomputes the *same sketch*, not just a tolerance gate. Only
the first 13 hex chars (52 bits) are used: 52-bit integers are exact in
IEEE doubles, so ratio arithmetic agrees across engines to the last bit.

- **KMV (k-minimum-values)** distinct-count: keep the k smallest distinct
  hash values per group; estimate ``(k-1) * 2^52 / h_(k)``. Mergeable
  (union of k-smallest sets, re-take k smallest) — the 100 TB shape: per
  partition bounded state, one tiny merge. Implemented with a salted
  two-phase TOP-k (per-salt window prunes to k rows each, then a final
  window over <= n_salt*k survivors) so no partition ever materializes a
  full per-group sort.
- **Count-min** frequency: d x w counter matrix, ``est(x) = min_j
  C[j][h_j(x)]`` — always an overestimate (property certified in the
  output). The matrix is a d*w-row DataFrame (mergeable by summing
  buckets); point queries broadcast the candidate side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^52: hashes are 52-bit so this is the normalization constant; exact in
# a double, so Spark and DuckDB divide identically.
HASH_SPACE = float(1 << 52)


def md5_hash52(col) -> F.Column:
    """52-bit integer hash from the md5 hex prefix — the shared
    cross-engine hash primitive (DuckDB: ``('0x' || substr(md5(x),1,13))
    ::BIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    n_salt: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Returns (group_col, exact_distinct, kmv_distinct, rel_err_pct).
    Groups with fewer than k distinct values report the exact count (the
    sketch IS exact below k — standard KMV convention).
    """
    d = (
        df.select(group_col, value_col)
        .distinct()
        .withColumn("h", md5_hash52(F.col(value_col)))
    )
    # phase 1: per (group, salt) keep the k smallest hashes — bounded
    # window partitions regardless of group skew; the global k smallest
    # are necessarily among the per-salt k smallest.
    w1 = Window.partitionBy(group_col, F.col("h") % n_salt).orderBy("h")
    pruned = (
        d.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # phase 2: <= n_salt*k rows per group — find the k-th smallest.
    w2 = Window.partitionBy(group_col).orderBy("h")
    kth = (
        pruned.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == k)
        .select(group_col, F.col("h").alias("kth_hash"))
    )
    exact = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = (
        F.when(
            F.col("kth_hash").isNotNull(),
            F.round((k - 1) * F.lit(HASH_SPACE) / F.col("kth_hash"), 0),
        )
        .otherwise(F.col("exact_distinct"))
        .cast("long")
    )
    return (
        exact.join(F.broadcast(kth), group_col, "left")
        .withColumn("kmv_distinct", est)
        .withColumn(
            "rel_err_pct",
            F.round(
                F.abs(F.col("kmv_distinct") - F.col("exact_distinct"))
                * 100.0
                / F.col("exact_distinct"),
                2,
            ),
        )
        .select(group_col, "exact_distinct", "kmv_distinct", "rel_err_pct")
    )


def kmv_set_ops(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style set operations from two KMV sketches: distinct
    estimates for |L|, |R|, |L ∪ R| and |L ∩ R| without ever computing
    the exact distinct sets together.

    Union: merge the two k-smallest sets, re-take k smallest (a valid
    KMV of the union — the classic mergeability property). Intersection
    via the theta-sketch estimator: among the union sketch's k hashes,
    the fraction present in BOTH sides, scaled by the union estimate.
    All hashes are md5-derived, so the oracle rebuilds identical
    sketches. Returns a single row (est_left, est_right, est_union,
    est_intersection) — each a bigint.

    100 TB posture: each side reduces to <= k rows before anything is
    combined; the combine is a k-row union + window — driver never sees
    more than one output row.
    """

    def sketch(df: DataFrame) -> DataFrame:
        d = (
            df.select(F.col(value_col).alias("v"))
            .distinct()
            .select(md5_hash52(F.col("v")).alias("h"))
            .distinct()  # 52-bit collisions: keep hash-set semantics exact
        )
        w = Window.partitionBy(F.lit(1)).orderBy("h")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    ls, rs = sketch(left), sketch(right)

    def estimate(sk: DataFrame):
        """KMV estimate as a 1-row frame (n, kth, est)."""
        w = Window.partitionBy(F.lit(1)).orderBy("h")
        ranked = sk.withColumn("rn", F.row_number().over(w))
        return ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
        ).select(
            F.when(
                F.col("kth").isNotNull(),
                F.round((k - 1) * F.lit(HASH_SPACE) / F.col("kth"), 0),
            )
            .otherwise(F.col("n"))
            .cast("long")
            .alias("est")
        )

    # union sketch: k smallest of the merged hash sets
    both = ls.select("h").union(rs.select("h")).distinct()
    wu = Window.partitionBy(F.lit(1)).orderBy("h")
    union_ranked = both.withColumn("rn", F.row_number().over(wu))
    union_sketch = union_ranked.filter(F.col("rn") <= k).drop("rn")
    union_est = estimate(union_sketch)

    # intersection: fraction of the union sketch's hashes in both sides
    marked = (
        union_sketch.join(ls.select(F.col("h").alias("h")).withColumn("_l", F.lit(1)), "h", "left")
        .join(rs.select(F.col("h").alias("h")).withColumn("_r", F.lit(1)), "h", "left")
        .agg(
            F.count(F.lit(1)).alias("ku"),
            F.sum(
                F.when(F.col("_l").isNotNull() & F.col("_r").isNotNull(), 1).otherwise(0)
            ).alias("kboth"),
        )
    )
    return (
        estimate(ls).withColumnRenamed("est", "est_left")
        .crossJoin(estimate(rs).withColumnRenamed("est", "est_right"))
        .crossJoin(union_est.withColumnRenamed("est", "est_union"))
        .crossJoin(marked)
        .select(
            "est_left",
            "est_right",
            "est_union",
            F.round(F.col("est_union") * F.col("kboth") / F.col("ku"), 0)
            .cast("long")
            .alias("est_intersection"),
        )
    )


def kmv_quantiles(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    k: int = 256,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_salt: int = 32,
) -> DataFrame:
    """Per-group quantile estimates from a k-minimum-hash UNIFORM row
    sample — the KMV idea applied to order statistics.

    The k rows whose ``md5(id)`` hashes are smallest form a uniform
    without-replacement sample of the group (the hash is a fixed random
    permutation of row ids), so the sample's ceil(q·n_s)-th smallest
    value estimates the group's q-quantile with the usual
    O(1/sqrt(k)) order-statistic error. Mergeable exactly like KMV
    distinct-count: union two groups' samples, re-take the k smallest
    hashes — the 100 TB shape (bounded per-partition state, tiny
    merge). Groups with <= k rows are sampled in full, so their
    quantiles are EXACT (standard KMV convention).

    Deterministic and bit-exact vs the SQL oracle: selection order is
    (h, value), value ranking order is (value, h) — both total orders,
    both computable identically in DuckDB from the shared md5 primitive.
    Returns (group_col, n_sampled, p<q1>, p<q2>, ...).

    Scale shape: the same salted two-phase bottom-k as ``kmv_distinct``
    (no per-group full sort at any size); the final per-group rank
    window touches <= k rows per group.
    """
    d = (
        df.select(group_col, id_col, value_col)
        # null values have no place in an order statistic, and null ids
        # have no hash — dropped in the oracle identically
        .filter(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .withColumn("h", md5_hash52(F.col(id_col)))
    )
    # phase 1: per (group, salt) keep the k smallest hashes — the global
    # k smallest are necessarily among the per-salt k smallest
    w1 = Window.partitionBy(group_col, F.col("h") % n_salt).orderBy(
        "h", value_col
    )
    pruned = (
        d.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # phase 2: <= n_salt*k rows per group — the actual sample
    w2 = Window.partitionBy(group_col).orderBy("h", value_col)
    sample = (
        pruned.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # rank sampled values; ceil(q*n_s)-th smallest is the estimate
    wv = Window.partitionBy(group_col).orderBy(value_col, "h")
    wg = Window.partitionBy(group_col)
    ranked = sample.withColumn("vrn", F.row_number().over(wv)).withColumn(
        "n_s", F.count(F.lit(1)).over(wg)
    )
    aggs = [F.max("n_s").alias("n_sampled")]
    for q in quantiles:
        pos = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n_s")))
        name = f"p{str(q).replace('0.', '').ljust(2, '0')}"
        aggs.append(
            F.max(F.when(F.col("vrn") == pos, F.col(value_col))).alias(name)
        )
    return ranked.groupBy(group_col).agg(*aggs)


def weighted_reservoir_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int = 100,
) -> DataFrame:
    """Deterministic Efraimidis–Spirakis weighted sampling without
    replacement: key each row by u^(1/w) with u = md5-hash-uniform in
    (0,1), keep the n largest keys. Heavier rows win proportionally —
    the exact A-ES reservoir semantics, but reproducible (no RNG) and
    oracle-checkable. Equivalent single-pass form at scale: per
    partition keep n largest (mergeable), then merge — here expressed
    as a salted two-phase top-n so no partition sorts the full input.

    Returns (id_col, weight_col, es_key) for the n winners.

    Weights must be strictly positive — the E-S scheme is undefined
    otherwise (w=0 divides by zero → null key → silent drop; w<0
    inverts the key ordering → silently wrong sample). Enforced
    JVM-side via a conditional raise_error inside the key expression:
    zero extra passes, fails loud on the first bad row (r6 advisor)."""
    # u in (0,1]: (h+1) / 2^52 — strictly positive so log is defined
    u = (md5_hash52(F.col(id_col)) + 1) / F.lit(HASH_SPACE)
    w = F.col(weight_col).cast("double")
    es_key = F.when(
        w <= 0,
        F.raise_error(
            F.concat(
                F.lit(
                    "weighted_reservoir_sample: non-positive weight for "
                    f"{id_col}="
                ),
                F.col(id_col).cast("string"),
                F.lit(" — E-S sampling requires weight > 0"),
            )
        ).cast("double"),
    ).otherwise(F.round(F.pow(u, 1.0 / w), 8))
    keyed = df.select(id_col, weight_col, es_key.alias("es_key"))
    w1 = Window.partitionBy(md5_hash52(F.col(id_col)) % 32).orderBy(
        F.col("es_key").desc(), F.col(id_col).asc()
    )
    pruned = (
        keyed.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )
    w2 = Window.partitionBy(F.lit(1)).orderBy(
        F.col("es_key").desc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def countmin_estimates(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    top: int = 20,
) -> DataFrame:
    """Count-min frequency estimates for the `top` heaviest values.

    Builds the d x w sketch as a DataFrame (one groupBy — mergeable
    partial aggregation), takes the exact top-`top` values (count desc,
    value asc — deterministic), and reads each candidate's min-bucket
    estimate. Returns (value_col, exact_cnt, cm_est, overcount,
    is_overestimate) — `is_overestimate` is provably TRUE (CM never
    undercounts).
    """
    vals = df.select(F.col(value_col).alias("v"))
    rows = F.array(*[F.lit(j) for j in range(depth)])

    def bucket(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), col.cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % width
        )

    sketch = (
        vals.withColumn("j", F.explode(rows))
        .withColumn("bucket", bucket(F.col("v")))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    candidates = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("v").asc())
        .limit(top)
    )
    probes = candidates.withColumn("j", F.explode(rows)).withColumn(
        "bucket", bucket(F.col("v"))
    )
    est = (
        sketch.join(F.broadcast(probes), ["j", "bucket"])
        .groupBy("v", "exact_cnt")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return est.select(
        F.col("v").alias(value_col),
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") - F.col("exact_cnt")).alias("overcount"),
        (F.col("cm_est") >= F.col("exact_cnt")).alias("is_overestimate"),
    )
