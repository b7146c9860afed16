"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on deterministic
transcripts; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (relational mirrors §2.11 + training-data ops)
with DuckDB oracles where SQL can express the semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-turn extraction (PDF parse + HTML boilerplate strip)
    over a deterministic transcripts table; smoke-checked by the driver."""
    from pdfminer_six_spark.datagen.transcripts import transcripts_pandas
    from pdfminer_six_spark.spark.pipeline import extract_transcripts

    df = spark.createDataFrame(transcripts_pandas(n_convs=20))
    return extract_transcripts(df, sort_output=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdfminer_six_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pdfminer_six_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
