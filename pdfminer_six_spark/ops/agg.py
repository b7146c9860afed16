"""Skew-resistant aggregation: the two-level (salted) combine.

A group-by on a skewed key routes every row of the hot key through one
reducer task — the straggler that stalls a 1000-executor stage.  The
two-level form aggregates on (key, salt) first (spreading the hot key
over ``buckets`` tasks), then merges the partials per key.  Only valid
for algebraic aggregates (sum/count/min/max — anything with an
associative merge); Spark's AQE skew handling covers joins, but a
skewed AGGREGATE key still needs this explicit treatment when map-side
partial aggregation alone can't absorb it (high distinct-value inputs
defeat the hash-map partials).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_sum_count"]


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    buckets: int = 16,
) -> DataFrame:
    """SUM(value) and COUNT(*) per key via (key, salt) partials.

    The salt is derived from the whole row's monotonically increasing id
    surrogate — `pmod(xxhash64(all cols), buckets)` — so rows of the hot
    key spread uniformly without any RNG (deterministic replay under
    retries).  Returns one row per key: (keys..., total, n_rows)."""
    keys = list(keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    # DECIMAL accumulation: exact and associative, so the two-level sum
    # is bit-identical to a direct one-level sum (a double sum would
    # differ in the last ulps because the addition ORDER changes)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(F.col(value).cast("decimal(18,2)")).alias("_psum"),
            F.count("*").alias("_pn"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").cast("double").alias("total"),
        F.sum("_pn").alias("n_rows"),
    )
