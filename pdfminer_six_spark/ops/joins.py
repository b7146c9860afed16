"""Custom join operators Spark's DataFrame API lacks as primitives.

As-of join: for every left row, attach the most recent right row with the
same key and right_ts <= left_ts — the standard time-series enrichment
(trades->quotes, events->latest account state).  Spark has no native
ASOF JOIN; the scalable formulation is the union + last-non-null window:

    union both sides tagged -> one shuffle on (key), sort by (ts, side)
    -> last(right cols, ignorenulls) over rows-unbounded-preceding
    -> keep left rows

One shuffle total, no join explosion, skew behaves like any window over
the key (salt the key upstream if one key dominates).  A per-key sort is
exactly what a merge-based as-of needs — this IS the distributed
merge-join plan, expressed declaratively so AQE still handles partition
sizing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (right_ts <= left_ts, latest wins).

    ``on``: equality key columns (same names on both sides).
    ``value_cols``: right columns to attach (default: all non-key,
    non-ts right columns), each renamed with ``suffix``.

    Ties: a right row AT the left timestamp matches (<=); among right
    rows sharing (key, right_ts) the one latest in the deterministic
    (ts, side) window order wins — pre-aggregate the right side to one
    row per (key, ts) for fully specified semantics (the DuckDB ASOF
    oracle requires the same).  Left rows with no match are dropped
    (inner as-of, matching DuckDB's default)."""
    on = list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    value_cols = list(value_cols)
    out_vals = [f"{v}{suffix}" for v in value_cols]
    left_keep = [c for c in left.columns]

    # the right row travels as ONE struct (non-null whenever a right row
    # exists, even if every value inside it is NULL): last-ignorenulls
    # over the struct picks whole rows, so (a) a matched row whose value
    # happens to be NULL is not mistaken for "no match", and (b) values
    # from different right rows can never interleave
    r_struct = F.struct(
        *[F.col(v).alias(v) for v in value_cols]
    )
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(
            f"{v}:{right.schema[v].dataType.simpleString()}"
            for v in value_cols
        ) + ">"
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        null_struct.alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left_keep],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_keep],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "_f", F.last("_r", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("_side") == 1)
        .filter(F.col("_f").isNotNull())
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in left_keep],
            *[F.col("_f")[v].alias(o) for v, o in zip(value_cols, out_vals)],
        )
    )
