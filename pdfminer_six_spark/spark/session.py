"""SparkSession factory with scale-appropriate defaults.

The knobs here are the ones that matter for the 100 TB design point
(SURVEY.md §4): AQE for runtime re-planning and skew splitting, Arrow for
the UDF boundary, bounded Arrow batch sizes so one batch of multi-MB PDF
payloads cannot blow worker memory, and a shuffle partition count sized for
the local harness (cluster deploys override via spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pdfminer-six-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 64,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create/tune a session.

    ``arrow_batch_rows`` bounds rows per Arrow batch entering pandas UDFs:
    payloads are documents (potentially MBs), so batches are kept small —
    vectorization is across *turns in a batch*, and worker memory stays flat.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(str(cpus)) if str(cpus).isdigit() else 8, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows)
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
