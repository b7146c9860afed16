"""Sources (SURVEY.md §2.1 S1): whole-document ingest.

For transcript tables the payload is already a column; for raw document
corpora (a directory/bucket of PDFs) we use Spark's binaryFile source —
splittable listing, lazy content read, pushdown on path/length — and feed
the same extraction kernel.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DOC_EXTRACTED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("text", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
    ]
)


def read_pdf_corpus(
    spark: SparkSession, glob_path: str, limit_bytes: Optional[int] = None
) -> DataFrame:
    """binaryFile scan over a PDF corpus: (path, length, content)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(glob_path)
        .select("path", "length", "content")
    )
    if limit_bytes:
        # predicate on file length prunes at the listing level
        df = df.filter(F.col("length") <= limit_bytes)
    return df


def extract_pdf_corpus(
    corpus: DataFrame, password: str = ""
) -> DataFrame:
    """(path, content) -> per-document extracted text, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdfminer_six_spark.core.crypto import EncryptionError
        from pdfminer_six_spark.core.extract import extract_text

        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                try:
                    text = extract_text(bytes(content), password=password)
                    rows.append(
                        (path, text, text.count("\f"),
                         "ok" if text else "empty", "")
                    )
                except EncryptionError as e:
                    rows.append((path, "", 0, "bad_password", str(e)))
                except Exception as e:
                    rows.append(
                        (path, "", 0, "error", f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DOC_EXTRACTED_SCHEMA.fields]
            )

    return corpus.select("path", "content").mapInPandas(
        run, schema=DOC_EXTRACTED_SCHEMA
    )
