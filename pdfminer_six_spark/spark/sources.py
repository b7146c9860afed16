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


IMAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("page", IntegerType()),
        StructField("name", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("fmt", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha256", StringType()),
    ]
)


def extract_images_corpus(corpus: DataFrame, password: str = "") -> DataFrame:
    """(path, content) -> one row per embedded image, Arrow-batched.

    The payload itself stays on the executor — we emit format + size +
    content hash so dedup/join logic downstream never shuffles megabyte
    blobs; a local sink (core/image.py:ImageWriter) re-derives identical
    bytes when files are wanted (the jb2/bmp exports are deterministic,
    tested against the reference's goldens)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from pdfminer_six_spark.core.extract import extract_pages
        from pdfminer_six_spark.core.image import export_image_bytes
        from pdfminer_six_spark.core.layout import LTContainer, LTImage

        def walk(item):
            if isinstance(item, LTImage):
                yield item
            elif isinstance(item, LTContainer):
                for child in item:
                    yield from walk(child)

        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                try:
                    pages = extract_pages(bytes(content), password=password)
                    for pageno, page in enumerate(pages, 1):
                        inline_seq = 0
                        for img in walk(page):
                            # inline images carry id()-based names in both
                            # engines (reference pdfinterp.py:1310-1315) —
                            # unusable as distributed keys; renumber them
                            # in deterministic emission order
                            name = img.name
                            if name.isdigit():
                                inline_seq += 1
                                name = f"inline-{inline_seq}"
                            try:
                                ext, payload = export_image_bytes(img)
                            except Exception:
                                ext, payload = ".err", b""
                            rows.append(
                                (
                                    path,
                                    pageno,
                                    name,
                                    img.srcsize[0],
                                    img.srcsize[1],
                                    img.bits,
                                    ext,
                                    len(payload),
                                    hashlib.sha256(payload).hexdigest(),
                                )
                            )
                except Exception:
                    continue
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields]
            )

    return corpus.select("path", "content").mapInPandas(run, schema=IMAGE_SCHEMA)
