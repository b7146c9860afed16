"""Corpus INDEX-BUILD job: materialize, as ONE stage-resumable
spark-submit artifact set, every model/index relation the incremental and
retrieval ops consume (the "you never recompute the index per query"
production shape):

    01_fingerprints  (doc_id, fp)           exact-dedup md5 index — the
                                            jobs/dedup.py --index input and
                                            the streaming crawl-delta
                                            anti-join side
    02_minhash       (doc_id, sig)          minhash signature index —
                                            ops.dedup.incremental_minhash's
                                            historical side
    03_bands         (doc_id, band, bucket) banded LSH buckets — the
                                            candidate equi-join relation
    04_lm            (w1, w2, cb)           bigram-LM counts — the
                                            ngram_lm_scores model= artifact
                                            (train-once / score-many)
    05_postings      (term, doc_id, tf)     BM25 posting lists
    06_doclens       (doc_id, dl)           BM25 document lengths
    07_kmeans        (vec_id, cell, dist_sq) fixed-point k-means assignment
                                            (only with --embeddings)

Each stage is a parquet directory under --workdir with _SUCCESS-gated
resume and lineage rows, exactly the jobs/build.py contract; artifact
correctness is pytest-pinned by consuming each artifact through the op
that reads it and asserting equality with the inline path
(tests/test_jobs_tables.py::test_index_job_*).

Usage:

    spark-submit --py-files dist/pdfminer_six_spark.zip jobs/index.py \
        --input /data/documents --workdir /data/index \
        [--embeddings /data/embeddings] [--resume]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

_JOBS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_JOBS_DIR))

_spec = importlib.util.spec_from_file_location(
    "_jobs_build", os.path.join(_JOBS_DIR, "build.py")
)
_jobs_build = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_jobs_build)
_Build = _jobs_build._Build

STAGES = (
    "fingerprints", "minhash", "bands", "lm", "postings", "doclens",
    "kmeans",
)


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True,
                   help="documents parquet/table: (doc_id, text, ...)")
    p.add_argument("--workdir", required=True,
                   help="artifact root; one parquet dir per stage")
    p.add_argument("--embeddings", default=None,
                   help="optional embeddings parquet (vec_id, embedding) "
                        "-> also build the k-means assignment artifact")
    p.add_argument("--num-hashes", type=int, default=16)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--kmeans-k", type=int, default=8)
    p.add_argument("--kmeans-iters", type=int, default=4)
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose _SUCCESS already exists")
    p.add_argument("--fail-after", choices=STAGES, default=None,
                   help="TEST HOOK: raise after this stage commits")
    return p.parse_args(argv)


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from pdfminer_six_spark.ops.dedup import (
        _banded_signatures,
        minhash_signatures,
        normalized_text,
    )
    from pdfminer_six_spark.ops.retrieval import bigram_lm_model
    from pdfminer_six_spark.ops.textstats import tokens_col

    docs = spark.read.parquet(args.input).select("doc_id", "text")
    b = _Build(spark, args)

    def _fps():
        return docs.select(
            "doc_id", F.md5(normalized_text(F.col("text"))).alias("fp")
        )

    b.run_stage(1, "fingerprints", _fps)

    def _sigs():
        return minhash_signatures(docs, num_hashes=args.num_hashes)

    sig = b.run_stage(2, "minhash", _sigs)

    # bands derive from the COMMITTED signature artifact (read back, not
    # recomputed): consistent by construction, and resume-safe
    b.run_stage(
        3, "bands",
        lambda: _banded_signatures(sig, args.num_hashes, args.bands),
    )
    b.run_stage(4, "lm", lambda: bigram_lm_model(docs))

    toks = docs.select(
        "doc_id",
        F.explode(tokens_col(normalized_text(F.col("text")))).alias("term"),
    )
    b.run_stage(
        5, "postings",
        lambda: toks.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).alias("tf")
        ),
    )
    b.run_stage(
        6, "doclens",
        lambda: toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")),
    )

    if args.embeddings:
        from pdfminer_six_spark.ops.ann import kmeans_fixed_point

        emb = spark.read.parquet(args.embeddings)
        b.run_stage(
            7, "kmeans",
            lambda: kmeans_fixed_point(
                emb, k=args.kmeans_k, n_iters=args.kmeans_iters
            ),
        )
    else:
        b.stats["kmeans"] = {"action": "skipped (no --embeddings)"}
    return b.stats


def main():
    args = build_args()
    from pdfminer_six_spark.spark.session import build_session

    spark = build_session("pdfminer-six-spark-index")
    try:
        stats = run(spark, args)
        print(stats)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
