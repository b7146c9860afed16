#!/usr/bin/env python3
"""spark-submit entry point for the FULL corpus build — every stage of a
training-data pipeline composed as one resumable artifact (the sequence
the other jobs expose piecewise):

    01_extract  transcripts -> text        (jobs/extract.py's kernel)
    02_clean    PII redaction + corpus-global paragraph dedup
                (jobs/clean.py's semantics)
    03_dedup    exact fingerprint drop, then MinHash-LSH near-dup
                clusters, canonical survivor per cluster
                (jobs/dedup.py's semantics)
    04_score    bigram-LM perplexity -> CCNet language/ppl buckets
                (sketch cutoffs — the no-global-sort 100x path); keep
                head/middle buckets
    05_mix      (optional, --mix-budget) temperature-scaled source
                rebalancing (alpha=0.5, bucketed scale path)
    06_pack     greedy sharded sequence packing into --seq-len bins; with
                --shuffle-seed the packing order is train_order's
                deterministic md5 permutation (the global training-data
                shuffle), not crawl order

Usage:

    bash jobs/package.sh     # builds dist/pdfminer_six_spark.zip
    spark-submit --py-files dist/pdfminer_six_spark.zip jobs/build.py \
        --input  <transcripts parquet (conv_id, turn_idx, tool, text)> \
        --workdir <stage-output root> \
        --output  <final packed parquet> \
        [--resume] [--seq-len 2048] [--threshold 0.6] \
        [--keep-buckets 1,2] [--password ...]

Resume model: each stage writes its parquet under --workdir/<NN_stage>
and appends one lineage row to --workdir/lineage.  With ``--resume``
every stage whose ``_SUCCESS`` marker already exists is SKIPPED (read
back, never recomputed), so a crashed build restarts at exactly the
failed stage.  Stage writes are atomic at the Spark commit-protocol
level (the marker appears only after a complete write), which makes the
whole job idempotent at stage granularity — rerunning a finished build
with --resume recomputes nothing and rewrites only the final --output.

``--fail-after <stage>`` injects a crash immediately after that stage
commits — the hook the failure-injection resume test drives; it has no
effect on any stage's output.

Scale: every stage is the ops layer's bucketed/sharded production shape
(LSH bands for the near-dup join, sketch percentile cutoffs for the
buckets, sharded running sums for packing); nothing here introduces a
driver-side loop beyond the cluster iteration's convergence counts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ("extract", "clean", "dedup", "score", "mix", "pack")


def build_args(argv=None):
    p = argparse.ArgumentParser(description="end-to-end corpus build")
    p.add_argument("--input", required=True,
                   help="transcripts parquet (conv_id, turn_idx, tool, text)")
    p.add_argument("--workdir", required=True,
                   help="root for per-stage parquet outputs + lineage")
    p.add_argument("--output", required=True,
                   help="final packed-sequences parquet")
    p.add_argument("--resume", action="store_true",
                   help="skip every stage whose _SUCCESS marker exists")
    p.add_argument("--password", default="")
    p.add_argument("--threshold", type=float, default=0.6,
                   help="near-dup Jaccard threshold for the LSH stage")
    p.add_argument("--seq-len", type=int, default=2048,
                   help="tokens per packed training sequence")
    p.add_argument("--n-shards", type=int, default=32,
                   help="independent packing shards (scale with cluster)")
    p.add_argument("--mix-budget", type=int, default=None,
                   help="optional stage 05: temperature-scaled source "
                        "mixing (alpha=0.5) down to this many docs "
                        "before packing; omit to skip the stage")
    p.add_argument("--shuffle-seed", default=None,
                   help="optional: deterministic training-order shuffle "
                        "before packing — sequences are packed in the "
                        "md5(seed:id) permutation order instead of "
                        "doc-id order (train_order's contract)")
    p.add_argument("--keep-buckets", default="1,2",
                   help="comma list of CCNet ppl buckets to keep "
                        "(1=head 2=middle 3=tail; CCNet trains on 1,2)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="fault-tolerant checkpoint dir for the cluster "
                        "loop (defaults to <workdir>/_checkpoints)")
    p.add_argument("--fail-after", choices=STAGES, default=None,
                   help="TEST HOOK: raise immediately after this stage "
                        "commits (drives the failure-injection resume test)")
    return p.parse_args(argv)


def _stage_path(workdir: str, idx: int, name: str) -> str:
    return os.path.join(workdir, f"{idx:02d}_{name}")


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class _Build:
    """Stage runner: compute-or-read-back per stage, lineage appended per
    completed stage."""

    def __init__(self, spark, args):
        self.spark = spark
        self.args = args
        self.stats: dict = {}
        self.lineage_path = os.path.join(args.workdir, "lineage")

    def run_stage(self, idx: int, name: str, build_fn):
        from pyspark.sql import functions as F

        path = _stage_path(self.args.workdir, idx, name)
        if self.args.resume and _committed(path):
            self.stats[name] = {"action": "skipped"}
            return self.spark.read.parquet(path)
        t0 = time.perf_counter()
        build_fn().write.mode("overwrite").parquet(path)
        wall = time.perf_counter() - t0
        out = self.spark.read.parquet(path)
        n = out.count()
        self.stats[name] = {"action": "computed", "rows": n,
                            "wall_s": round(wall, 3)}
        self.spark.createDataFrame(
            [(name, n, float(wall))], "stage string, n_rows long, wall_s double"
        ).withColumn("committed_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(self.lineage_path)
        if self.args.fail_after == name:
            raise RuntimeError(
                f"injected failure after stage '{name}' (--fail-after)"
            )
        return out


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from pdfminer_six_spark.ops import dedup as dd
    from pdfminer_six_spark.ops.clean import (
        pack_sequences,
        paragraph_dedup,
        redact_pii,
        temperature_mix,
        train_order,
    )
    from pdfminer_six_spark.ops.dedup import normalized_text
    from pdfminer_six_spark.ops.retrieval import ccnet_buckets
    from pdfminer_six_spark.spark.pipeline import extract_transcripts

    spark.sparkContext.setCheckpointDir(
        args.checkpoint_dir or os.path.join(args.workdir, "_checkpoints")
    )
    b = _Build(spark, args)

    # ---- 01 extract: transcripts -> (doc_id, source, text) ----
    def _extract():
        transcripts = spark.read.parquet(args.input)
        extracted = extract_transcripts(
            transcripts, password=args.password
        ).filter(F.col("status") == "ok")
        return extracted.select(
            F.concat_ws(
                "#", "conv_id", F.col("turn_idx").cast("string")
            ).alias("doc_id"),
            # the extraction kernel consumes `tool` (it is not in its
            # output schema); the payload kind survives as n_pages
            F.when(F.col("n_pages") > 0, "pdf")
            .otherwise("plain")
            .alias("source"),
            "text",
        )

    docs = b.run_stage(1, "extract", _extract)

    # ---- 02 clean: PII redaction + corpus-global paragraph dedup ----
    def _clean():
        red = redact_pii(docs).withColumn("text", F.col("redacted")).drop(
            "redacted"
        )
        para = paragraph_dedup(red)
        return (
            red.drop("text")
            .join(para, "doc_id")
            .withColumnRenamed("clean_text", "text")
            .filter(F.length("text") > 0)
        )

    cleaned = b.run_stage(2, "clean", _clean)

    # ---- 03 dedup: exact fingerprint drop, then LSH near-dup clusters ----
    def _dedup():
        from pyspark.sql.window import Window

        # exact: one survivor (min doc_id) per normalized-content hash
        w = Window.partitionBy(
            F.md5(normalized_text(F.col("text")))
        ).orderBy("doc_id")
        uniq = (
            cleaned.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # near-dup ids must be numeric for the cluster loop: a stable
        # 64-bit surrogate; xxhash64 collisions over realistic corpus
        # sizes are the documented ~n^2/2^65 risk (see ops/dedup.py)
        keyed = uniq.withColumn("doc_num", F.xxhash64("doc_id"))
        pairs = dd.minhash_near_duplicates(
            keyed.select(F.col("doc_num").alias("doc_id"), "text"),
            threshold=args.threshold,
        ).checkpoint()
        clusters = dd.duplicate_clusters(pairs, reliable_checkpoint=True)
        drop = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias("doc_num"))
        return keyed.join(drop, "doc_num", "left_anti").drop("doc_num")

    survivors = b.run_stage(3, "dedup", _dedup)

    # ---- 04 score: LM perplexity -> CCNet buckets (sketch cutoffs) ----
    keep_buckets = [int(x) for x in args.keep_buckets.split(",") if x]

    def _score():
        # the LM's deterministic train-slice (pmod(id, ...)) and the
        # bucket tiebreaks need a NUMERIC id: same xxhash64 surrogate as
        # the dedup stage
        keyed = survivors.withColumn("doc_num", F.xxhash64("doc_id"))
        buckets = ccnet_buckets(
            keyed, cutoffs="sketch", id_col="doc_num"
        )
        return (
            keyed.join(buckets, "doc_num")
            .filter(F.col("bucket").isin(keep_buckets))
            .drop("doc_num")
        )

    scored = b.run_stage(4, "score", _score)

    # ---- 05 mix (optional): temperature-scaled source rebalancing ----
    if args.mix_budget:
        def _mix():
            sel = temperature_mix(
                scored, budget_docs=args.mix_budget, id_col="doc_id",
                mode="bucketed",
            )
            return scored.join(
                sel.select("doc_id"), "doc_id", "left_semi"
            )

        to_pack = b.run_stage(5, "mix", _mix)
    else:
        to_pack = scored
        b.stats["mix"] = {"action": "skipped (no --mix-budget)"}

    # ---- 06 pack: sharded greedy packing into seq-len bins ----
    def _pack():
        if args.shuffle_seed:
            # pack in the shuffled order: train_order's contiguous pos
            # becomes the packing id, so shard assignment and intra-
            # shard order follow the md5 permutation (the training-data
            # global shuffle), not crawl order
            order = train_order(
                to_pack, seed=args.shuffle_seed, id_col="doc_id",
                mode="sharded",
            ).select("doc_id", "pos")
            keyed = to_pack.join(order, "doc_id").withColumn(
                "doc_num", F.col("pos")
            )
        else:
            keyed = to_pack.withColumn("doc_num", F.xxhash64("doc_id"))
        packed = pack_sequences(
            keyed,
            capacity=args.seq_len,
            n_shards=args.n_shards,
            id_col="doc_num",
        )
        # restore the string doc_id (pack emits only its numeric id)
        return packed.join(
            keyed.select("doc_num", "doc_id", "source"), "doc_num"
        ).drop("doc_num")

    packed = b.run_stage(6, "pack", _pack)

    packed.write.mode("overwrite").parquet(args.output)
    final = spark.read.parquet(args.output)
    b.stats["final"] = {
        "rows": final.count(),
        "n_sequences": final.select("shard", "seq_idx").distinct().count(),
    }
    return b.stats


def main() -> None:
    from pdfminer_six_spark.spark.session import build_session

    args = build_args()
    spark = build_session(app_name="corpus-build")
    stats = run(spark, args)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
