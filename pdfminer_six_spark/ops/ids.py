"""Stable global row numbering — the scale-correct ordinal assignment.

`ROW_NUMBER() OVER (ORDER BY key)` with no PARTITION BY forces every row
through ONE task (Spark plans a single-partition window) — the classic
100 TB cliff.  The distributed formulation is the two-phase scheme
`zipWithIndex` uses under the hood, expressed on DataFrames:

    range-partition on the key  ->  sort within partitions
    ->  per-partition local row_number (window keyed on the partition id)
    ->  add per-partition offsets (exclusive prefix sum of partition
        counts — one tiny driver-side array, one row per partition)

Result: identical numbering to the global window, but every stage is
parallel; the only serial object is the partition-count array (bounded
by the partition count, thousands at most).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["stable_row_ids"]


def stable_row_ids(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign 0-based consecutive ids in total ``order_by`` order.

    ``order_by`` must be a total order (unique key combination) for the
    numbering to be well-defined; equal keys land in the same range
    partition, where the window's order tiebreak decides — pass a unique
    key to make the result exactly reproducible."""
    order_by = list(order_by)
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_by)
    # pin the partitioning: repartitionByRange draws fresh boundary
    # samples on every evaluation, so the offset pass and the final join
    # would otherwise see DIFFERENT partitionings (observed: duplicate
    # and gapped ids).  localCheckpoint materializes one partitioning
    # that both passes share.
    local = with_pid.withColumn("_rn", F.row_number().over(w)).localCheckpoint()
    # exclusive prefix sum of partition counts: tiny (one row per
    # partition) — collected, summed, and broadcast back as a join
    counts = sorted(
        (r["_pid"], r["n"])
        for r in local.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = df.sparkSession.createDataFrame(
        offsets, schema="_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.col("_rn") - 1 + F.col("_off"))
        .drop("_pid", "_rn", "_off")
    )
