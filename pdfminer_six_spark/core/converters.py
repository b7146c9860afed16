"""Structured sinks (SURVEY.md §2.1 S7-S10): XML / HTML / hOCR / tag output
from analyzed layout trees.

Element nesting, attribute sets, and text framing follow the reference
converters (pdfminer.six converter.py:383-837 XML/HTML, pdfdevice.py:255-327
TagExtractor).  In the Spark engine these are *formatting* functions — pure
``LTPage -> str`` — so a DataFrame of per-turn XML is just one more
``mapInPandas`` projection over the same extraction kernel.
"""

from __future__ import annotations

from typing import List, Optional

from pdfminer_six_spark.core.layout import (
    LTAnno,
    LTChar,
    LTCurve,
    LTFigure,
    LTImage,
    LTLine,
    LTPage,
    LTRect,
    LTTextBox,
    LTTextBoxVertical,
    LTTextGroup,
    LTTextLine,
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _bbox(o) -> str:
    return f"{o.x0:.3f},{o.y0:.3f},{o.x1:.3f},{o.y1:.3f}"


def page_to_xml(page: LTPage, page_number: int = 1) -> str:
    """<page><textbox><textline><text …> nesting (reference converter.py:735-837)."""
    out: List[str] = []

    def text_el(item) -> str:
        if isinstance(item, LTChar):
            return (
                f'<text font="{_esc(str(item.fontname))}" bbox="{_bbox(item)}" '
                f'size="{item.size:.3f}">{_esc(item.get_text())}</text>\n'
            )
        if isinstance(item, LTAnno):
            return f"<text>{_esc(item.get_text())}</text>\n"
        return ""

    def render(item) -> None:
        if isinstance(item, LTTextBox):
            wmode = "tb-rl" if isinstance(item, LTTextBoxVertical) else "lr-tb"
            out.append(
                f'<textbox id="{item.index}" bbox="{_bbox(item)}" wmode="{wmode}">\n'
            )
            for line in item:
                if isinstance(line, LTTextLine):
                    out.append(f'<textline bbox="{_bbox(line)}">\n')
                    for ch in line:
                        out.append(text_el(ch))
                    out.append("</textline>\n")
            out.append("</textbox>\n")
        elif isinstance(item, LTFigure):
            out.append(f'<figure name="{_esc(item.name)}" bbox="{_bbox(item)}">\n')
            for child in item:
                render(child)
            out.append("</figure>\n")
        elif isinstance(item, LTLine):
            out.append(f'<line linewidth="{item.linewidth}" bbox="{_bbox(item)}" />\n')
        elif isinstance(item, LTRect):
            out.append(f'<rect linewidth="{item.linewidth}" bbox="{_bbox(item)}" />\n')
        elif isinstance(item, LTCurve):
            out.append(f'<curve linewidth="{item.linewidth}" bbox="{_bbox(item)}" />\n')
        elif isinstance(item, LTImage):
            out.append(f'<image src="{_esc(item.name)}" width="{item.srcsize[0]}" '
                       f'height="{item.srcsize[1]}" />\n')
        elif isinstance(item, LTTextLine):
            out.append(f'<textline bbox="{_bbox(item)}">\n')
            for ch in item:
                out.append(text_el(ch))
            out.append("</textline>\n")
        elif isinstance(item, (LTChar, LTAnno)):
            out.append(text_el(item))

    out.append(
        f'<page id="{page_number}" bbox="{_bbox(page)}" rotate="{page.rotate}">\n'
    )
    for child in page:
        render(child)
    out.append("</page>\n")
    return "".join(out)


def pages_to_xml(pages: List[LTPage]) -> str:
    body = "".join(page_to_xml(p, i + 1) for i, p in enumerate(pages))
    return '<?xml version="1.0" encoding="utf-8" ?>\n<pages>\n' + body + "</pages>\n"


def page_to_html(page: LTPage, page_number: int = 1, scale: float = 1.0) -> str:
    """Absolutely-positioned spans (reference HTMLConverter converter.py:383-681,
    simplified: text boxes and lines only)."""
    H = page.y1
    out: List[str] = [
        f'<div class="page" id="page-{page_number}" style="position:relative;'
        f"width:{page.x1 * scale:.0f}px;height:{page.y1 * scale:.0f}px;"
        'border:1px solid gray;">\n'
    ]
    def emit_box(box) -> None:
        for line in box:
            if not isinstance(line, LTTextLine):
                continue
            left = line.x0 * scale
            top = (H - line.y1) * scale
            size = max(
                (c.size for c in line if isinstance(c, LTChar)), default=10.0
            )
            out.append(
                f'<span style="position:absolute;left:{left:.0f}px;'
                f"top:{top:.0f}px;font-size:{size * scale:.0f}px;"
                f'white-space:pre;">{_esc(line.get_text())}</span>\n'
            )

    for item in page:
        if isinstance(item, LTTextBox):
            emit_box(item)
        elif isinstance(item, LTFigure):
            for sub in item:
                if isinstance(sub, LTTextBox):
                    emit_box(sub)
    out.append("</div>\n")
    return "".join(out)


def pages_to_html(pages: List[LTPage]) -> str:
    body = "".join(page_to_html(p, i + 1) for i, p in enumerate(pages))
    return (
        "<html><head>\n"
        '<meta http-equiv="Content-Type" content="text/html; charset=utf-8">\n'
        "</head><body>\n" + body + "</body></html>\n"
    )


def page_to_hocr(page: LTPage, page_number: int = 1) -> str:
    """hOCR interchange (reference HOCRConverter converter.py:842-1016,
    essentials: ocr_page / ocr_carea / ocr_line with bbox titles)."""
    H = page.y1

    def hbbox(o) -> str:
        # hOCR uses top-left origin integer pixel coords
        return f"bbox {o.x0:.0f} {H - o.y1:.0f} {o.x1:.0f} {H - o.y0:.0f}"

    out = [
        f'<div class="ocr_page" id="page_{page_number}" title="{hbbox(page)}">\n'
    ]
    for item in page:
        if not isinstance(item, LTTextBox):
            continue
        out.append(f'<div class="ocr_carea" title="{hbbox(item)}">\n')
        for line in item:
            if isinstance(line, LTTextLine):
                out.append(
                    f'<span class="ocr_line" title="{hbbox(line)}">'
                    f"{_esc(line.get_text())}</span>\n"
                )
        out.append("</div>\n")
    out.append("</div>\n")
    return "".join(out)


def pages_to_hocr(pages: List[LTPage]) -> str:
    body = "".join(page_to_hocr(p, i + 1) for i, p in enumerate(pages))
    return (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
        "<html><head><meta name='ocr-capabilities' "
        "content='ocr_page ocr_carea ocr_line'/></head><body>\n"
        + body
        + "</body></html>\n"
    )


class TagExtractor:
    """Marked-content tag sink (SURVEY.md §2.1 S10; reference
    pdfdevice.py:255-327): emits the structure-tag stream with page
    wrappers and decoded text, no layout analysis."""

    def __init__(self) -> None:
        self.ctm = None
        self.pageno = 0
        self._stack: List[str] = []
        self.parts: List[str] = []

    def set_ctm(self, ctm) -> None:
        self.ctm = ctm

    def _w(self, s: str) -> None:
        self.parts.append(s)

    def begin_page(self, page, ctm) -> None:
        x0, y0, x1, y1 = page.mediabox
        self._w(
            f'<page id="{self.pageno}" '
            f'bbox="{x0:.3f},{y0:.3f},{x1:.3f},{y1:.3f}" '
            f'rotate="{page.rotate}">'
        )

    def end_page(self, page) -> None:
        self._w("</page>\n")
        self.pageno += 1

    def begin_figure(self, name, bbox, matrix) -> None: ...
    def end_figure(self, name) -> None: ...
    def paint_path(self, *a) -> None: ...
    def render_image(self, name, stream) -> None: ...

    def render_string(self, textstate, seq, ncs, graphicstate) -> None:
        from pdfminer_six_spark.core.fonts import UnicodeNotDefined

        font = textstate.font
        if font is None:
            return
        text = ""
        for obj in seq:
            if not isinstance(obj, bytes):
                continue
            for cid in font.decode(obj):
                try:
                    text += font.to_unichr(cid)
                except UnicodeNotDefined:
                    pass
        self._w(_esc(text))

    def begin_tag(self, tag, props=None) -> None:
        attrs = ""
        if isinstance(props, dict):
            attrs = "".join(
                f' {_esc(str(k))}="{_esc(str(v))}"'
                for k, v in sorted(props.items())
            )
        self._w(f"<{_esc(str(tag.name))}{attrs}>")
        self._stack.append(str(tag.name))

    def end_tag(self) -> None:
        if self._stack:
            self._w(f"</{_esc(self._stack.pop())}>")

    def do_tag(self, tag, props=None) -> None:
        self.begin_tag(tag, props)
        if self._stack:
            self._stack.pop()

    def get_output(self) -> str:
        return "".join(self.parts)


def extract_tags(data: bytes, password: str = "") -> str:
    """Tag-stream extraction over a whole document."""
    from pdfminer_six_spark.core.document import get_pages
    from pdfminer_six_spark.core.interp import Interpreter, ResourceManager

    device = TagExtractor()
    interp = Interpreter(ResourceManager(), device)
    for page in get_pages(data, password=password):
        interp.process_page(page)
    return device.get_output()
