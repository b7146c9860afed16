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
