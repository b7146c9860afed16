"""spark-submit job against catalog TABLES (the Iceberg deployment shape):
--tables switches all I/O to `spark.read.table` / `writeTo().append()` —
the DataSourceV2 API an Iceberg catalog plugs into.  The sandbox ships no
Iceberg jar, so the test drives the identical code path through Spark's
built-in session catalog (same read/write API, different catalog impl)."""

import argparse

import pytest

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    from pdfminer_six_spark.spark.session import build_session

    wh = tmp_path_factory.mktemp("warehouse")
    s = build_session(
        app_name="jobs-tables-test", master="local[4]", shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()


def _args(**kw):
    base = dict(
        input="", output="", lineage=None, tables=True, password="",
        resume=False, rebalance=None, sorted_output=False, streaming=False,
        checkpoint=None, images=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_job_reads_and_writes_catalog_tables(spark):
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "jobs_extract",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "jobs", "extract.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    from pdfminer_six_spark.datagen.transcripts import transcripts_pandas

    pdf = transcripts_pandas(n_convs=6)
    spark.createDataFrame(pdf).write.mode("overwrite").saveAsTable(
        "transcripts_in"
    )

    job.run(spark, _args(input="transcripts_in", output="extracted_out",
                         lineage="lineage_out"))
    out = spark.read.table("extracted_out")
    assert out.count() == len(pdf)
    assert set(out.select("status").distinct().toPandas().status) == {"ok"}
    assert spark.read.table("lineage_out").count() > 0

    # resume against the committed table: nothing left to do, 0 new rows
    job.run(spark, _args(input="transcripts_in", output="extracted_out",
                         lineage="lineage_out", resume=True))
    assert spark.read.table("extracted_out").count() == len(pdf)

    # resume with a missing output table falls back to a full run
    job.run(spark, _args(input="transcripts_in", output="extracted_fresh",
                         resume=True))
    assert spark.read.table("extracted_fresh").count() == len(pdf)


def test_bucketed_tables_join_without_shuffle(spark):
    """Bucketing — the co-located-join strategy for repeated big joins at
    100 TB: both sides written bucketed on the join key land their
    matching buckets in the same task, so the join plans with ZERO
    exchanges (only per-bucket sorts).  The same declaration shape is
    what Iceberg bucket-partitioning provides on a real cluster."""
    sf = "/root/testdata/sf0.01"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_b"))
    (customer.write.mode("overwrite").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("customer_b"),
                spark.table("orders_b").o_custkey
                == spark.table("customer_b").c_custkey,
            )
            .groupBy("c_mktsegment")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1]
        # no shuffle feeds the join: the only Exchange allowed is the
        # one ABOVE it for the final segment aggregation
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part
        rows = {r["c_mktsegment"]: r["count"] for r in joined.collect()}
        assert sum(rows.values()) == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dedup_job_end_to_end(spark, tmp_path):
    """jobs/dedup.py: LSH pairs -> clusters -> survivors; survivors keep
    exactly one doc (the min id) per duplicate cluster and every
    pair-free doc."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "jobs_dedup",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "jobs", "dedup.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    out = tmp_path / "dd_survivors"
    pairs_out = tmp_path / "dd_pairs"
    clusters_out = tmp_path / "dd_clusters"
    args = job.build_args([
        "--input", "/root/testdata/sf0.01/documents.parquet",
        "--output", str(out),
        "--pairs-output", str(pairs_out),
        "--clusters-output", str(clusters_out),
        "--method", "lsh",
        "--threshold", "0.6",
    ])
    stats = job.run(spark, args)
    assert stats["n_docs"] == 500
    assert stats["n_pairs"] == 25  # known near-dup pairs at sf0.01
    assert stats["n_survivors"] == stats["n_docs"] - stats["n_dropped"]
    surv = spark.read.parquet(str(out))
    clus = spark.read.parquet(str(clusters_out))
    # every cluster keeps exactly its min member
    kept = {r["doc_id"] for r in surv.select("doc_id").collect()}
    for row in clus.collect():
        if row["doc_id"] == row["cluster_id"]:
            assert row["doc_id"] in kept
        else:
            assert row["doc_id"] not in kept
    assert surv.count() == stats["n_survivors"]


def test_clean_job_end_to_end(spark, tmp_path):
    """jobs/clean.py: PII redaction + paragraph dedup over a corpus with
    injected boilerplate; the boilerplate paragraph survives exactly once
    corpus-wide and PII tokens replace every address/number."""
    import importlib.util, os

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "jobs_clean",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "jobs", "clean.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    boiler = "unsubscribe at any time"
    src = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [
                f"doc {i} body mail-me at user{i}@mail.example\n\n{boiler}"
                for i in range(6)
            ],
        }
    )
    inp = tmp_path / "clean_in.parquet"
    src.to_parquet(inp)
    out = tmp_path / "clean_out"
    stats_out = tmp_path / "clean_stats"
    args = job.build_args([
        "--input", str(inp),
        "--output", str(out),
        "--stats-output", str(stats_out),
    ])
    stats = job.run(spark, args)
    assert stats["n_docs"] == 6
    assert stats["total_n_email"] == 6
    assert stats["total_n_paras"] == 12
    assert stats["total_n_kept"] == 7  # 6 bodies + 1 surviving boilerplate
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[0] == f"doc 0 body mail-me at <EMAIL>\n\n{boiler}"
    for i in range(1, 6):
        assert got[i] == f"doc {i} body mail-me at <EMAIL>"
    st = spark.read.parquet(str(stats_out)).collect()[0]
    assert st["n_docs"] == 6 and st["total_n_email"] == 6
