"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2.11
streaming row; north-rule resume story).

Incremental ingest of new transcript turns: readStream on a parquet/Iceberg
directory -> the same Arrow-batched extraction kernel (mapInPandas works
unchanged on streaming DataFrames) -> sink with checkpointing, so restart
resumes exactly where the last committed batch ended.  A tumbling-window
per-conversation metrics aggregation with a watermark handles late turns.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdfminer_six_spark.spark.pipeline import (
    TRANSCRIPTS_SCHEMA,
    extract_transcripts,
)


def read_transcripts_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a growing directory of transcript parquet.
    (On a cluster this is an Iceberg streaming read; the file source has
    the same exactly-once semantics via checkpointed file tracking.)"""
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def streaming_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """transcripts stream -> extracted parquet with exactly-once resume.

    The extraction kernel is identical to the batch path — row-local, so
    it needs no state store; the checkpoint only tracks source offsets
    and sink commits.
    """
    stream = read_transcripts_stream(spark, input_dir)
    extracted = extract_transcripts(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_metrics(
    transcripts: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-conversation turn counts with late-data
    tolerance — the streaming mirror of the lineage/metrics table."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("tool") == "pdf", 1).otherwise(0)).alias(
                "n_pdf_turns"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id",
            "n_turns",
            "n_pdf_turns",
        )
    )
