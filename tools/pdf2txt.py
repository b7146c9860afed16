#!/usr/bin/env python3
"""CLI parity with the reference's tools/pdf2txt.py (reference
tools/pdf2txt.py:317-320): extract text/xml/html/hocr from PDFs.

    python tools/pdf2txt.py [-t text|xml|html|hocr] [-P password]
                            [-p pagenos] [-m maxpages]
                            [--line-margin F] [--boxes-flow F|disabled]
                            file.pdf ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfminer_six_spark.core.converters import (  # noqa: E402
    pages_to_hocr,
    pages_to_html,
    pages_to_xml,
)
from pdfminer_six_spark.core.extract import extract_pages, extract_text  # noqa: E402
from pdfminer_six_spark.core.layout import LAParams  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("-t", "--output_type", default="text",
                    choices=["text", "xml", "html", "hocr"])
    ap.add_argument("-o", "--outfile", default=None)
    ap.add_argument("-P", "--password", default="")
    ap.add_argument("-p", "--pagenos", default=None,
                    help="comma-separated 1-based page numbers")
    ap.add_argument("-m", "--maxpages", type=int, default=0)
    ap.add_argument("--char-margin", type=float, default=2.0)
    ap.add_argument("--line-margin", type=float, default=0.5)
    ap.add_argument("--word-margin", type=float, default=0.1)
    ap.add_argument("--line-overlap", type=float, default=0.5)
    ap.add_argument("--boxes-flow", default="0.5",
                    help="float in [-1,1], or 'disabled'")
    ap.add_argument("-V", "--detect-vertical", action="store_true")
    ap.add_argument("-A", "--all-texts", action="store_true")
    ap.add_argument("--output-dir", default=None,
                    help="export embedded images into this directory")
    args = ap.parse_args()

    boxes_flow = None if args.boxes_flow == "disabled" else float(args.boxes_flow)
    laparams = LAParams(
        line_overlap=args.line_overlap,
        char_margin=args.char_margin,
        line_margin=args.line_margin,
        word_margin=args.word_margin,
        boxes_flow=boxes_flow,
        detect_vertical=args.detect_vertical,
        all_texts=args.all_texts,
    )
    pagenos = (
        {int(x) - 1 for x in args.pagenos.split(",")} if args.pagenos else None
    )
    out = open(args.outfile, "w", encoding="utf-8") if args.outfile else sys.stdout
    from pdfminer_six_spark.core.crypto import EncryptionError

    imagewriter = None
    if args.output_dir:
        from pdfminer_six_spark.core.image import ImageWriter
        from pdfminer_six_spark.core.layout import LTContainer, LTImage

        imagewriter = ImageWriter(args.output_dir)

        def export_images(item) -> None:
            if isinstance(item, LTImage):
                imagewriter.export_image(item)
            elif isinstance(item, LTContainer):
                for child in item:
                    export_images(child)

    for path in args.files:
        with open(path, "rb") as f:
            data = f.read()
        if imagewriter is not None:
            for page in extract_pages(
                data, password=args.password, page_numbers=pagenos,
                maxpages=args.maxpages, laparams=laparams,
            ):
                export_images(page)
        if args.output_type == "text":
            try:
                text = extract_text(
                    data, password=args.password, page_numbers=pagenos,
                    maxpages=args.maxpages, laparams=laparams,
                )
            except EncryptionError as e:
                sys.stderr.write(f"pdf2txt: {path}: {e}\n")
                sys.exit(1)
            out.write(text)
            continue
        pages = list(
            extract_pages(
                data, password=args.password, page_numbers=pagenos,
                maxpages=args.maxpages, laparams=laparams,
            )
        )
        if args.output_type == "xml":
            out.write(pages_to_xml(pages))
        elif args.output_type == "html":
            out.write(pages_to_html(pages))
        else:
            out.write(pages_to_hocr(pages))
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
