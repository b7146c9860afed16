#!/usr/bin/env python3
"""Extract text/xml/html/hocr/tag from PDFs.

CLI parity with the reference's tools/pdf2txt.py (reference
tools/pdf2txt.py:71-313): same option surface — page selection (-p /
--page-numbers / -m), LAParams dials (-n/-A/-V/margins/--boxes-flow),
output types (-t, plus outfile-extension inference), codec (-c), HTML
scale/layoutmode (-s/-Y), control stripping (-S), page rotation (-R),
and image export (--output-dir).  Sink outputs are byte-identical to the
reference converters (tests/test_converters_parity.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfminer_six_spark.core.converters import (  # noqa: E402
    extract_tags,
    pages_to_hocr,
    pages_to_html,
    pages_to_xml,
)
from pdfminer_six_spark.core.extract import extract_pages, extract_text  # noqa: E402
from pdfminer_six_spark.core.layout import LAParams  # noqa: E402

OUTPUT_TYPES = ((".htm", "html"), (".html", "html"), (".xml", "xml"), (".tag", "tag"))


def float_or_disabled(x: str):
    if x.lower().strip() == "disabled":
        return None
    try:
        return float(x)
    except ValueError as err:
        raise argparse.ArgumentTypeError(f"invalid float value: {x}") from err


def create_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__, add_help=True)
    ap.add_argument("files", nargs="+", help="One or more paths to PDF files.")
    ap.add_argument("--debug", "-d", default=False, action="store_true")
    ap.add_argument("--disable-caching", "-C", default=False, action="store_true")
    ap.add_argument("--page-numbers", type=int, default=None, nargs="+",
                    help="A space-separated list of page numbers to parse.")
    ap.add_argument("--pagenos", "-p", type=str, default=None,
                    help="A comma-separated list of page numbers to parse "
                         "(legacy).")
    ap.add_argument("--maxpages", "-m", type=int, default=0)
    ap.add_argument("--password", "-P", type=str, default="")
    ap.add_argument("--rotation", "-R", default=0, type=int,
                    help="The number of degrees to rotate the PDF before "
                         "other types of processing.")
    ap.add_argument("--no-laparams", "-n", default=False, action="store_true",
                    help="If layout analysis parameters should be ignored.")
    ap.add_argument("--detect-vertical", "-V", default=False,
                    action="store_true")
    ap.add_argument("--line-overlap", type=float, default=0.5)
    ap.add_argument("--char-margin", "-M", type=float, default=2.0)
    ap.add_argument("--word-margin", "-W", type=float, default=0.1)
    ap.add_argument("--line-margin", "-L", type=float, default=0.5)
    ap.add_argument("--boxes-flow", "-F", type=float_or_disabled, default=0.5,
                    help="float in [-1,1], or 'disabled'")
    ap.add_argument("--all-texts", "-A", default=False, action="store_true")
    ap.add_argument("--outfile", "-o", type=str, default="-")
    ap.add_argument("--output_type", "-t", type=str, default="text",
                    choices=["text", "xml", "html", "hocr", "tag"])
    ap.add_argument("--codec", "-c", type=str, default="utf-8")
    ap.add_argument("--output-dir", "-O", default=None,
                    help="The output directory to put extracted images in.")
    ap.add_argument("--layoutmode", "-Y", default="normal",
                    choices=["exact", "normal", "loose"])
    ap.add_argument("--scale", "-s", type=float, default=1.0)
    ap.add_argument("--strip-control", "-S", default=False,
                    action="store_true")
    return ap


def main(argv=None) -> None:
    args = create_parser().parse_args(argv)

    if args.no_laparams:
        laparams = None
    else:
        laparams = LAParams(
            line_overlap=args.line_overlap,
            char_margin=args.char_margin,
            line_margin=args.line_margin,
            word_margin=args.word_margin,
            boxes_flow=args.boxes_flow,
            detect_vertical=args.detect_vertical,
            all_texts=args.all_texts,
        )

    if args.page_numbers:
        pagenos = {x - 1 for x in args.page_numbers}
    elif args.pagenos:
        pagenos = {int(x) - 1 for x in args.pagenos.split(",")}
    else:
        pagenos = None

    output_type = args.output_type
    if output_type == "text" and args.outfile != "-":
        for override, alttype in OUTPUT_TYPES:
            if args.outfile.endswith(override):
                output_type = alttype

    imagewriter = None
    if args.output_dir:
        from pdfminer_six_spark.core.image import ImageWriter

        imagewriter = ImageWriter(args.output_dir)

    if args.outfile == "-":
        out = sys.stdout
        codec = "utf-8" if sys.stdout.encoding is not None else args.codec
    else:
        out = open(args.outfile, "w", encoding=args.codec, errors="replace")
        codec = args.codec

    from pdfminer_six_spark.core.crypto import EncryptionError
    from pdfminer_six_spark.core.image import ImageWriter as _IW  # noqa: F401
    from pdfminer_six_spark.core.layout import LTContainer, LTImage

    def export_images(item) -> None:
        if isinstance(item, LTImage):
            imagewriter.export_image(item)
        elif isinstance(item, LTContainer):
            for child in item:
                export_images(child)

    for path in args.files:
        with open(path, "rb") as f:
            data = f.read()
        common = dict(
            password=args.password, page_numbers=pagenos,
            maxpages=args.maxpages, rotation=args.rotation,
        )
        try:
            if imagewriter is not None and output_type in ("text", "tag"):
                # text/tag sinks skip images; walk the layout separately
                for page in extract_pages(data, laparams=laparams, **common):
                    export_images(page)
            if output_type == "text":
                out.write(extract_text(data, laparams=laparams, **common))
                continue
            if output_type == "tag":
                out.write(
                    extract_tags(
                        data, password=args.password, page_numbers=pagenos,
                        maxpages=args.maxpages, rotation=args.rotation,
                    )
                )
                continue
            pages = list(extract_pages(data, laparams=laparams, **common))
        except EncryptionError as e:
            sys.stderr.write(f"pdf2txt: {path}: {e}\n")
            sys.exit(1)
        if output_type == "xml":
            out.write(
                pages_to_xml(
                    pages, stripcontrol=args.strip_control,
                    imagewriter=imagewriter,
                )
            )
        elif output_type == "html":
            out.write(
                pages_to_html(
                    pages, scale=args.scale, layoutmode=args.layoutmode,
                    imagewriter=imagewriter,
                )
            )
        else:
            out.write(pages_to_hocr(pages, stripcontrol=args.strip_control))
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
