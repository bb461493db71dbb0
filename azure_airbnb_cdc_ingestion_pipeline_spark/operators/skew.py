"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these explicit operators cover the two cases AQE can't:

- **salted_agg**: a single hot group key (e.g. one language dominating a
  corpus groupBy) funnels into one reducer. Two-phase aggregation over
  (key, salt) spreads the hot key across `salt_buckets` reducers, then
  re-combines — the classic map-side-combine-by-hand for algebraic aggs.
- **salted_broadcast_left**: skewed join where the big side's hot keys
  would overload one task and the small side fits in memory → broadcast
  replicates the small side to every task, removing the shuffle (and the
  skew) entirely. For medium small-sides, `explode_small_side` replicates
  the small side `salt_buckets` times so a shuffle join on
  (key, salt) spreads the hot key.

All pure DataFrame ops — composable with everything else in the engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Salt derived from a hash of the FULL ROW CONTENT — stable across
    task retries. (A monotonically_increasing_id-based salt is recomputed
    nondeterministically on shuffle-fetch-failure recovery, so a retried
    row could land in a different (key, salt) phase-1 group than the
    partials already fetched — lost/duplicated rows. Content hashing keeps
    every recomputation in the same bucket.) Identical rows share a salt;
    for algebraic aggregates that only concentrates exact-duplicate rows,
    which natural data spreads fine."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    `aggs` maps output column name -> (partial_agg_expr, final_agg_expr),
    where the partial runs per (key, salt) and the final re-combines per
    key; both phases must be algebraic (sum/count/min/max — avg is
    expressed as sum+count by the caller). Example::

        salted_agg(df, ["lang"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("value"),     F.sum("total")),
        })

    Phase 1 shuffles on (keys, salt) — the hot key spreads over
    `salt_buckets` reducers; phase 2 shuffles `salt_buckets` rows per key.
    """
    keys = list(keys)
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _final) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_p, final) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame, small: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Skew-proof join: broadcast the small side. No shuffle of the big
    side at all, so per-key skew is irrelevant — each task streams its
    partition against the replicated hash table."""
    return big.join(F.broadcast(small), list(on), how)


def explode_small_side(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted shuffle join for when the small side is too big to broadcast:
    big rows get a random salt; small rows are replicated once per salt
    value; the join key becomes (on..., salt), spreading each hot key over
    `salt_buckets` tasks at the cost of `salt_buckets`x the small side's
    shuffle volume."""
    on = list(on)
    big_s = with_salt(big, salt_buckets)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, [*on, "__salt"], how)
    return out.drop("__salt")
