#!/usr/bin/env python3
"""Structured-streaming micro-bench (r03 VERDICT stretch item): measure the
streaming extraction surface against the batch path on the SAME staged
corpus, so the "streaming variant" claim has a grounded number.

Stages a transcripts corpus as N parquet files, drives
``streaming_extract`` (file source, maxFilesPerTrigger=8, availableNow)
through its checkpointed exactly-once sink, then runs the batch kernel on
the identical input.  Prints ONE JSON line:

    {"metric": "streaming extraction throughput", "streaming_sec": ...,
     "batch_sec": ..., "turns": N, "streaming_turns_per_sec": ...,
     "batch_turns_per_sec": ..., "n_input_files": ..., "n_batches": ...}

Usage: python3 scripts/bench_streaming.py [n_convs] [n_files]
Same discipline as bench.py: run on a quiet box; the streaming number
includes micro-batch planning + checkpoint commits per trigger — that
overhead relative to one batch plan IS the measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pdfminer_six_spark.datagen.transcripts import transcripts_pandas
    from pdfminer_six_spark.spark.pipeline import extract_transcripts
    from pdfminer_six_spark.spark.session import build_session
    from pdfminer_six_spark.spark.streaming import streaming_extract

    spark = build_session(app_name="bench-streaming")
    work = tempfile.mkdtemp(prefix="bench_stream_")
    in_dir = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    ckpt_dir = os.path.join(work, "ckpt")
    try:
        pdf = transcripts_pandas(n_convs=n_convs)
        src = spark.createDataFrame(pdf)
        # n_files parquet files -> ceil(n_files / maxFilesPerTrigger=8)
        # micro-batches: the steady-state trigger cadence, not one giant
        # batch wearing a streaming hat
        src.repartition(n_files).write.mode("overwrite").parquet(in_dir)
        n_turns = len(pdf)

        t0 = time.perf_counter()
        q = streaming_extract(spark, in_dir, out_dir, ckpt_dir,
                              trigger_once=True)
        q.awaitTermination()
        streaming_sec = time.perf_counter() - t0
        got = spark.read.parquet(out_dir)
        n_out = got.count()
        assert n_out == n_turns, (n_out, n_turns)
        n_batches = len(
            [p for p in os.listdir(os.path.join(ckpt_dir, "commits"))
             if not p.startswith(".")]
        )

        t0 = time.perf_counter()
        n_batch_out = extract_transcripts(spark.read.parquet(in_dir)).count()
        batch_sec = time.perf_counter() - t0
        assert n_batch_out == n_turns

        print(json.dumps({
            "metric": "streaming extraction throughput (file source, "
                      "availableNow, checkpointed sink) vs batch on the "
                      "same corpus",
            "streaming_sec": round(streaming_sec, 3),
            "batch_sec": round(batch_sec, 3),
            "turns": n_turns,
            "streaming_turns_per_sec": round(n_turns / streaming_sec, 1),
            "batch_turns_per_sec": round(n_turns / batch_sec, 1),
            "n_input_files": n_files,
            "n_batches": n_batches,
            "max_files_per_trigger": 8,
            "parallelism": spark.sparkContext.defaultParallelism,
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
