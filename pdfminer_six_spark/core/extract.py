"""High-level extraction entry points (reference: high_level.py:147-227).

These are the kernels the Spark pipeline wraps in vectorized UDFs: pure
``bytes -> str`` / ``bytes -> LTPage list`` functions with no I/O.
"""

from __future__ import annotations

from typing import Iterator

from pdfminer_six_spark.core.device import LayoutDevice, TextDevice
from pdfminer_six_spark.core.document import get_pages
from pdfminer_six_spark.core.interp import Interpreter, ResourceManager
from pdfminer_six_spark.core.layout import LAParams, LTPage

def _as_bytes(pdf) -> bytes:
    """Accept the same inputs as the reference high-level API
    (utils.py:36-65 open_filename): bytes, str/PurePath filename, or a
    binary file-like."""
    import pathlib

    if isinstance(pdf, bytes):
        return pdf
    if isinstance(pdf, pathlib.PurePath):
        pdf = str(pdf)
    if isinstance(pdf, str):
        with open(pdf, "rb") as f:
            return f.read()
    if hasattr(pdf, "read"):
        data = pdf.read()
        if isinstance(data, bytes):
            return data
        raise TypeError("file-like input must be binary")
    raise TypeError(f"Unsupported input type: {type(pdf)}")


_AUTO = object()  # "caller didn't choose": default to LAParams(); explicit
# None means NO layout analysis (the reference pdf2txt -n path,
# tools/pdf2txt.py:147-152 passes laparams=None through)


def _apply_rotation(page, rotation: int):
    if rotation:
        page.rotate = (page.rotate + rotation) % 360  # high_level.py:141
    return page


def extract_text(
    data,
    password: str = "",
    page_numbers=None,
    maxpages: int = 0,
    laparams=_AUTO,
    rotation: int = 0,
) -> str:
    """Reference-equivalent of pdfminer.high_level.extract_text; accepts
    bytes, a filename/Path, or a binary file-like."""
    data = _as_bytes(data)
    if laparams is _AUTO:
        laparams = LAParams()
    device = TextDevice(laparams=laparams)
    # font cache is keyed by objid: scope it to one document
    interp = Interpreter(ResourceManager(), device)
    for page in get_pages(
        data, password=password, page_numbers=page_numbers, maxpages=maxpages
    ):
        interp.process_page(_apply_rotation(page, rotation))
    return device.get_text()


def extract_pages(
    data,
    password: str = "",
    page_numbers=None,
    maxpages: int = 0,
    laparams=_AUTO,
    rotation: int = 0,
) -> Iterator[LTPage]:
    """Reference-equivalent of pdfminer.high_level.extract_pages; accepts
    bytes, a filename/Path, or a binary file-like."""
    data = _as_bytes(data)
    if laparams is _AUTO:
        laparams = LAParams()
    rsrcmgr = ResourceManager()
    for pageno, page in enumerate(
        get_pages(
            data, password=password, page_numbers=page_numbers, maxpages=maxpages
        ),
        1,
    ):
        # sequential 1-based ids over *processed* pages, like the reference
        # device's running counter (converter.py:67-86)
        device = LayoutDevice(laparams=laparams, pageno=pageno)
        interp = Interpreter(rsrcmgr, device)
        interp.process_page(_apply_rotation(page, rotation))
        yield device.get_result()
