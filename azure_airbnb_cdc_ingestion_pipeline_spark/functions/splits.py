"""Deterministic dataset partitioning for training-data pipelines.

Charter extension (the reference has no dataset-curation surface):
train/val/test assignment and hash-bucket sharding as pure column
expressions. No randomness anywhere: a document's split is a stable
function of its id (md5 bucket), so assignments survive reruns, cluster
resizes, and corpus growth — `rand()`-based splits give none of those,
and `monotonically_increasing_id` changes with partitioning. The same
bucketing is expressible in any engine (md5 is md5), which is what makes
the split auditable outside Spark.

Scale posture: both helpers are map-only column expressions — no
shuffle, no state; they pipeline into whatever scan produces the rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col: str | Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): the first 4 md5-hex chars of the
    stringified id, parsed as a 16-bit int, mod buckets. 16 bits keeps
    `conv` exact and is plenty of entropy for ≤ ~1000 buckets."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def stable_split(
    df: DataFrame,
    id_col: str,
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    split_col: str = "split",
    buckets: int = 100,
) -> DataFrame:
    """Adds `split_col` assigning each row to one of `names` with
    approximately `weights` proportions (exact bucket-threshold shares of
    `buckets`). Deterministic per id; independent of row order and
    parallelism."""
    if len(weights) != len(names) or not names:
        raise ValueError("weights and names must be equal-length and non-empty")
    b = split_bucket(id_col, buckets)
    total = float(sum(weights))
    thresholds: list[tuple[int, str]] = []
    acc = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w
        thresholds.append((int(round(acc / total * buckets)), name))
    out: Column = F.lit(names[-1])
    for threshold, name in reversed(thresholds):
        out = F.when(b < threshold, F.lit(name)).otherwise(out)
    return df.withColumn(split_col, out)


def budget_select(
    docs: DataFrame,
    id_col: str,
    score_col: Column | str,
    weight_col: Column | str,
    budget: int,
    resolution: int = 10000,
) -> DataFrame:
    """Best-docs-under-a-token-budget selection: take documents in
    descending quality order until their cumulative weight (token count)
    reaches ``budget`` — the curation step that turns "score everything"
    into an actual training mix of a target size.

    The naive formulation is a GLOBAL window cumsum over the
    score-sorted corpus — a total sort plus a single-partition running
    sum, which does not survive 100 TB. This is the two-phase threshold
    form instead: scores are quantized to 1/``resolution`` (the
    quantized score is also the tie-break contract, so equal-bucket docs
    are admitted by ascending id — deterministic across engines and
    runs); phase 1 aggregates per-bucket weight sums (bounded:
    ≤ 2·resolution+1 groups regardless of corpus size) and the driver
    prefix-scans that tiny vector to find the cutoff bucket and the
    residual budget; phase 2 selects everything above the cutoff with a
    plain filter (map-only) and resolves ONLY the cutoff bucket with a
    window cumsum confined to that single bucket (~1/resolution of the
    corpus). No global sort, no unbounded state, and the driver touches
    resolution-many rows, not docs.

    Returns (id, score, weight) for the selected set; ``score`` is the
    quantized value used for ordering.
    """
    import math

    from pyspark.sql import Window

    # the round(score, d) quantizer only matches the documented
    # 1/resolution granularity when resolution is 10^d — enforce it
    # instead of silently quantizing at the next power of 10 down
    # (r4 advisor: resolution=5000 quantized at 1/1000)
    decimals = round(math.log10(resolution))
    if 10**decimals != resolution:
        raise ValueError(
            f"resolution must be a power of 10, got {resolution} "
            "(the quantizer is round(score, log10(resolution)))"
        )
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # NULL scores are unrankable: excluded EXPLICITLY (previously they
    # fell out of the >/== cutoff filters over budget but leaked into
    # the whole-corpus-fits branch — inconsistent)
    from ..session import track_persist

    # r10 (guide §5): `scored` feeds THREE consumers — the bucket
    # collect and both phase-2 branches (high + cutoff bucket) — and
    # its lineage carries the caller's scoring expression (per-token
    # md5 folds for the hash-classifier score: the dominant cost of the
    # whole selection). Persist the 24 B/row projection so the corpus
    # is scored ONCE; release_persisted() reclaims it between queries.
    scored = track_persist(
        docs.select(
            F.col(id_col).alias("id"),
            F.round(sc, decimals).alias("score"),
            wc.cast("long").alias("weight"),
        ).filter(F.col("score").isNotNull())
    )
    buckets = (
        scored.groupBy("score")
        .agg(F.sum("weight").alias("w"))
        .orderBy(F.desc("score"))
        .collect()  # bounded: ≤ 2*resolution+1 rows by construction
    )
    cum = 0
    cutoff, residual = None, 0
    for r in buckets:
        if cum + r.w > budget:
            cutoff, residual = r.score, budget - cum
            break
        cum += r.w
    if cutoff is None:  # whole corpus fits the budget
        return scored.select("id", "score", "weight")
    high = scored.filter(F.col("score") > cutoff)
    tie_w = Window.partitionBy("score").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tie = (
        scored.filter(F.col("score") == cutoff)
        .withColumn("cumw", F.sum("weight").over(tie_w))
        .filter(F.col("cumw") <= residual)
        .drop("cumw")
    )
    return high.unionByName(tie).select("id", "score", "weight")
