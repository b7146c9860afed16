"""Tests for navigation structures (outlines/page labels) and the
XML/HTML/hOCR sinks — differential against the reference where it exposes
the same API."""

import os

import pytest

from tests.conftest import SAMPLES, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference corpus absent"
)


def _read(name):
    with open(os.path.join(SAMPLES, name), "rb") as f:
        return f.read()


def test_page_labels_differential():
    import logging

    logging.disable(logging.WARNING)
    from tests.conftest import import_reference

    import_reference()
    from itertools import islice

    from pdfminer.pdfdocument import PDFDocument
    from pdfminer.pdfparser import PDFParser
    from io import BytesIO

    from pdfminer_six_spark.core.document import Document
    from pdfminer_six_spark.core.navigation import get_page_labels

    data = _read("contrib/pagelabels.pdf")
    ref_doc = PDFDocument(PDFParser(BytesIO(data)))
    want = list(islice(ref_doc.get_page_labels(), 8))
    got = list(islice(get_page_labels(Document(data)), 8))
    assert got == want


def test_outlines_differential():
    from tests.conftest import import_reference

    import_reference()
    from io import BytesIO

    from pdfminer.pdfdocument import PDFDocument, PDFNoOutlines
    from pdfminer.pdfparser import PDFParser

    from pdfminer_six_spark.core.document import Document
    from pdfminer_six_spark.core.navigation import NoOutlines, get_outlines

    import glob

    checked = 0
    for f in sorted(glob.glob(os.path.join(SAMPLES, "**/*.pdf"), recursive=True)):
        if "nonfree" in f or "encryption" in f:
            continue
        data = open(f, "rb").read()
        try:
            ref_doc = PDFDocument(PDFParser(BytesIO(data)))
            want = [(lv, t) for (lv, t, _d, _a, _s) in ref_doc.get_outlines()]
        except PDFNoOutlines:
            want = None
        except Exception:
            continue
        try:
            got = [(lv, t) for (lv, t, _d, _a, _s) in get_outlines(Document(data))]
        except NoOutlines:
            got = None
        assert got == want, f
        if want:
            checked += 1
    assert checked >= 1  # at least one sample actually has outlines


def test_xml_sink_structure():
    from pdfminer_six_spark.core.converters import pages_to_xml
    from pdfminer_six_spark.core.extract import extract_pages

    pages = list(extract_pages(_read("simple1.pdf")))
    xml = pages_to_xml(pages)
    assert xml.startswith('<?xml version="1.0"')
    assert xml.count("<page ") == 1
    assert "<textbox" in xml and "<textline" in xml and "<text " in xml
    assert "Hello"[0] in xml  # chars present


def test_html_and_hocr_sinks():
    from pdfminer_six_spark.core.converters import pages_to_hocr, pages_to_html
    from pdfminer_six_spark.core.extract import extract_pages

    pages = list(extract_pages(_read("simple1.pdf")))
    html = pages_to_html(pages)
    assert "position:absolute" in html and "Hello" in html
    hocr = pages_to_hocr(pages)
    assert "ocr_page" in hocr and "ocr_line" in hocr and "Hello" in hocr
