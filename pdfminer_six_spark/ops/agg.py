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
    scale: int = 2,
) -> DataFrame:
    """SUM(value) and COUNT(*) per key via (key, salt) partials.

    The salt hashes the row's physical position — `pmod(xxhash64(
    spark_partition_id(), monotonically_increasing_id()), buckets)` — not
    the row's content: a content hash sends fully identical duplicate
    rows (common in a dedup-oriented corpus) to ONE bucket, defeating the
    spread exactly where the hot key is hottest.  Position is RNG-free
    and task-deterministic, and the salt only routes partials — the merged
    result is salt-independent, so speculative re-execution is safe.
    Returns one row per key: (keys..., total, n_rows)."""
    keys = list(keys)
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    # DECIMAL accumulation: exact and associative, so the two-level sum
    # is bit-identical to a direct one-level sum (a double sum would
    # differ in the last ulps because the addition ORDER changes).
    # ``scale`` is the decimal scale values are rounded to on entry —
    # inputs with more fractional digits than ``scale`` are rounded, so
    # pick the scale of your data (2 suits money-like columns).
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(F.col(value).cast(f"decimal(18,{scale})")).alias("_psum"),
            F.count("*").alias("_pn"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").cast("double").alias("total"),
        F.sum("_pn").alias("n_rows"),
    )
