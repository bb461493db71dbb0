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
