#!/usr/bin/env python3
"""spark-submit entry point for the extraction pipeline.

Cluster usage (the north-rule deployment shape):

    bash jobs/package.sh     # builds dist/pdfminer_six_spark.zip
    spark-submit \
        --py-files dist/pdfminer_six_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=64 \
        jobs/extract.py \
        --input  <parquet-or-iceberg transcripts>  \
        --output <parquet-or-iceberg extracted>    \
        --lineage <parquet lineage/metrics>        \
        [--resume] [--rebalance N] [--streaming --checkpoint DIR]

The job is idempotent under --resume: already-committed (conv_id, turn_idx)
pairs are anti-joined away before extraction, so a restarted run does only
the remaining work (per-partition lineage rows committed with results).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--password", default="")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--rebalance", type=int, default=None,
                    help="round-robin repartition count before extraction")
    ap.add_argument("--sorted-output", action="store_true",
                    help="write sorted by (conv_id, turn_idx)")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--images", action="store_true",
                    help="input is a directory of PDFs (binaryFile scan); "
                         "emit one metadata+sha256 row per embedded image")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pdfminer_six_spark.spark.pipeline import (
        TRANSCRIPTS_SCHEMA,
        extract_transcripts,
        lineage_metrics,
        resume_filter,
    )

    spark = SparkSession.builder.appName("pdfminer-six-spark-extract").getOrCreate()

    if args.images:
        from pdfminer_six_spark.spark.sources import (
            extract_images_corpus,
            read_pdf_corpus,
        )

        corpus = read_pdf_corpus(spark, args.input)
        extract_images_corpus(corpus, password=args.password).write.mode(
            "append"
        ).parquet(args.output)
        return

    if args.streaming:
        from pdfminer_six_spark.spark.streaming import streaming_extract

        if not args.checkpoint:
            ap.error("--streaming requires --checkpoint")
        q = streaming_extract(
            spark, args.input, args.output, args.checkpoint, trigger_once=True
        )
        q.awaitTermination()
        return

    transcripts = spark.read.parquet(args.input)
    if args.resume:
        from pyspark.errors import AnalysisException

        try:
            done = spark.read.parquet(args.output)
            transcripts = resume_filter(transcripts, done)
        except AnalysisException as e:
            # only a missing output means "first run"; any other read error
            # (permissions, corrupt footer) must NOT silently downgrade to
            # a full re-run — mode('append') would duplicate committed rows
            if "PATH_NOT_FOUND" not in str(e):
                raise
    extracted = extract_transcripts(
        transcripts,
        password=args.password,
        rebalance_partitions=args.rebalance,
        sort_output=args.sorted_output,
    )
    if args.lineage:
        extracted = extracted.persist()
        extracted.write.mode("append").parquet(args.output)
        lineage_metrics(extracted).write.mode("append").parquet(args.lineage)
        extracted.unpersist()
    else:
        extracted.write.mode("append").parquet(args.output)


if __name__ == "__main__":
    main()
