"""Document index: xref/trailer resolution, object fetch, page tree.

Semantics per the reference (pdfminer.six pdfdocument.py:124-332 xref
flavors, :672-870 document init/getobj, :953-1018 startxref discovery and
xref chaining; pdfpage.py:25-224 page tree with inherited attrs).  This is
the "hash index + point lookup + catalog" of the engine (SURVEY.md §2.4).

Everything here operates on one in-memory payload inside a UDF; the only
distributed concern is that per-document caches are per-executor-process.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Iterator, List, Optional, Set, Tuple

from pdfminer_six_spark.core.lexer import reverse_lines
from pdfminer_six_spark.core.objects import (
    KWD,
    LIT,
    STRICT,
    LexEOF,
    ObjectNotFound,
    ParseError,
    StreamObject,
    choppairs,
    decipher_all,
    dict_value,
    int_value,
    list_value,
    nunpack,
    resolve1,
    safe_int,
    stream_value,
)
from pdfminer_six_spark.core.parser import ObjectParser

LITERAL_OBJSTM = LIT("ObjStm")
LITERAL_XREF = LIT("XRef")
LITERAL_CATALOG = LIT("Catalog")
LITERAL_PAGE = LIT("Page")
LITERAL_PAGES = LIT("Pages")
_KW_TRAILER = KWD(b"trailer")
_KW_XREF = KWD(b"xref")
_KW_OBJ = KWD(b"obj")
_KW_OBJ_R = KWD(b"R")
_KW_ENDOBJ_S = KWD(b"endobj")


class NoValidXRef(ParseError):
    pass


class EagerObjectParser(ObjectParser):
    """Object parser that flushes results eagerly — used for ObjStm content,
    which is a flat sequence of objects with no obj/endobj brackets.

    Keyword semantics mirror the reference's stream parser
    (pdfparser.py:155-173): only ``R`` assembles; ``obj``/``endobj`` are
    dropped; every other keyword — including ``null``, which the top-level
    parser maps to None — stays on the stack as a Keyword token, so object
    graphs inside ObjStm dump identically to the reference."""

    def flush(self) -> None:
        self.add_results(*self.popall())

    def do_keyword(self, pos: int, token) -> None:
        from pdfminer_six_spark.core.objects import ObjRef

        if token is _KW_OBJ_R:
            if len(self.stack) >= 2:
                ((_, objid_raw), _) = self.pop(2)
                objid = safe_int(objid_raw)
                if objid is not None:
                    self.push((pos, ObjRef(self.doc, objid)))
            return
        if token is _KW_OBJ or token is _KW_ENDOBJ_S:
            return
        self.push((pos, token))


class XRefTable:
    """Classic ``xref`` section: ascii rows ``pos gen n|f``."""

    def __init__(self) -> None:
        self.offsets: Dict[int, Tuple[Optional[int], int, int]] = {}
        self.trailer: Dict[str, Any] = {}

    def load(self, parser: ObjectParser) -> None:
        while True:
            try:
                pos, line = parser.nextline()
            except LexEOF:
                raise NoValidXRef("EOF in xref table")
            line = line.strip()
            if not line:
                continue
            if line.startswith(b"trailer"):
                parser.seek(pos)
                break
            fields = line.split(b" ")
            if len(fields) != 2:
                raise NoValidXRef(f"no trailer: {line!r}")
            try:
                start, nobjs = int(fields[0]), int(fields[1])
            except ValueError:
                raise NoValidXRef(f"bad section header: {line!r}")
            for objid in range(start, start + nobjs):
                try:
                    _, line = parser.nextline()
                except LexEOF:
                    raise NoValidXRef("EOF in xref rows")
                fields = line.strip().split(b" ")
                if len(fields) != 3:
                    raise NoValidXRef(f"bad xref row: {line!r}")
                pos_b, gen_b, use_b = fields
                if use_b != b"n":
                    continue
                p, g = safe_int(pos_b), safe_int(gen_b)
                if p is not None and g is not None:
                    self.offsets[objid] = (None, p, g)
        self.load_trailer(parser)

    def load_trailer(self, parser: ObjectParser) -> None:
        try:
            _, kwd = parser.lexer.nexttoken()
            if kwd is not _KW_TRAILER:
                raise NoValidXRef(f"expected trailer, got {kwd!r}")
            _, dic = parser.nextobject()
        except LexEOF:
            x = parser.pop(1)
            if not x:
                raise NoValidXRef("EOF before trailer dict")
            _, dic = x[0]
        self.trailer.update(dict_value(dic))

    def get_trailer(self) -> Dict[str, Any]:
        return self.trailer

    def get_objids(self) -> Iterable[int]:
        return self.offsets.keys()

    def get_pos(self, objid: int) -> Tuple[Optional[int], int, int]:
        return self.offsets[objid]


class XRefFallback(XRefTable):
    """Error-recovery path: regex-scan the whole file for ``N G obj`` cues
    and expand object streams (reference pdfdocument.py:206-254)."""

    CUE = re.compile(rb"^(\d+)\s+(\d+)\s+obj\b")

    def load(self, parser: ObjectParser) -> None:  # type: ignore[override]
        parser.seek(0)
        while True:
            try:
                pos, line = parser.nextline()
            except LexEOF:
                break
            if line.startswith(b"trailer"):
                parser.seek(pos)
                self.load_trailer(parser)
                break
            m = self.CUE.match(line)
            if not m:
                continue
            objid, genno = int(m.group(1)), int(m.group(2))
            self.offsets[objid] = (None, pos, genno)
            parser.seek(pos)
            try:
                _, obj = parser.nextobject()
            except (LexEOF, ParseError):
                continue
            if isinstance(obj, StreamObject) and obj.get("Type") is LITERAL_OBJSTM:
                n = obj.get("N")
                if not isinstance(n, int):
                    n = 0
                try:
                    inner = EagerObjectParser(obj.get_data(), parser.doc)
                except Exception:
                    continue
                objs: List[Any] = []
                try:
                    while True:
                        _, o = inner.nextobject()
                        objs.append(o)
                except LexEOF:
                    pass
                n = min(n, len(objs) // 2)
                for index in range(n):
                    objid1 = objs[index * 2]
                    if isinstance(objid1, int):
                        self.offsets[objid1] = (objid, index, 0)


class XRefStream:
    """PDF 1.5 cross-reference stream: binary-packed rows of widths /W,
    ranges from /Index (reference pdfdocument.py:257-332)."""

    def __init__(self) -> None:
        self.data: bytes = b""
        self.fields: Tuple[int, int, int] = (1, 1, 1)
        self.entlen = 3
        self.ranges: List[Tuple[int, int]] = []
        self.trailer: Dict[str, Any] = {}

    def load(self, parser: ObjectParser) -> None:
        parser.lexer.nexttoken()  # objid
        parser.lexer.nexttoken()  # genno
        parser.lexer.nexttoken()  # 'obj'
        _, stream = parser.nextobject()
        if (
            not isinstance(stream, StreamObject)
            or stream.get("Type") is not LITERAL_XREF
        ):
            raise NoValidXRef("not an /XRef stream")
        size = stream["Size"]
        index = resolve1(stream.get("Index", [0, size]))
        if len(index) % 2 != 0:
            raise NoValidXRef("odd /Index")
        self.ranges = list(choppairs(index))
        f1, f2, f3 = resolve1(stream["W"])
        self.fields = (int(f1), int(f2), int(f3))
        self.entlen = sum(self.fields)
        self.data = stream.get_data()
        self.trailer = stream.attrs

    def get_trailer(self) -> Dict[str, Any]:
        return self.trailer

    def get_objids(self) -> Iterator[int]:
        f1w = self.fields[0]
        i = 0
        for start, nobjs in self.ranges:
            for k in range(nobjs):
                ent = self.data[self.entlen * (i + k) :][: self.entlen]
                typ = nunpack(ent[:f1w], 1)
                if typ in (1, 2):
                    yield start + k
            i += nobjs

    def get_pos(self, objid: int) -> Tuple[Optional[int], int, int]:
        index = 0
        for start, nobjs in self.ranges:
            if start <= objid < start + nobjs:
                index += objid - start
                break
            index += nobjs
        else:
            raise KeyError(objid)
        f1w, f2w, _f3w = self.fields
        ent = self.data[self.entlen * index :][: self.entlen]
        typ = nunpack(ent[:f1w], 1)
        f2 = nunpack(ent[f1w : f1w + f2w])
        f3 = nunpack(ent[f1w + f2w :])
        if typ == 1:
            return (None, f2, f3)
        if typ == 2:
            return (f2, f3, 0)
        raise KeyError(objid)  # free object


class Document:
    """Parsed PDF document over an in-memory payload."""

    def __init__(
        self, data: bytes, password: str = "", caching: bool = True
    ) -> None:
        self.data = data
        self.caching = caching
        self.xrefs: List[Any] = []
        self.catalog: Dict[str, Any] = {}
        self.decipher = None
        self.is_extractable = True
        self._cached: Dict[int, Tuple[Any, int]] = {}
        self._objstm_cache: Dict[int, Tuple[List[Any], int]] = {}
        self.parser = ObjectParser(data, self)
        try:
            pos = self.find_xref()
            self.read_xref_from(pos, set())
        except NoValidXRef:
            self.parser.fallback = True
            xref = XRefFallback()
            xref.load(self.parser)
            self.xrefs.append(xref)
        for xref in self.xrefs:
            trailer = xref.get_trailer()
            if not trailer:
                continue
            if "Encrypt" in trailer:
                from pdfminer_six_spark.core.crypto import make_security_handler

                docid = (
                    list_value(trailer["ID"])
                    if "ID" in trailer
                    else [b"", b""]
                )
                param = dict_value(trailer["Encrypt"])
                handler = make_security_handler(docid, param, password)
                if handler is not None:
                    self.decipher = handler.decrypt
                    self.is_extractable = handler.is_extractable()
                    self.parser.fallback = False
            if "Root" in trailer:
                self.catalog = dict_value(trailer["Root"])
                break
        else:
            raise ParseError("no /Root object — not a PDF?")

    # --- xref discovery ---

    def find_xref(self) -> int:
        prev = b""
        for line in reverse_lines(self.data):
            line = line.strip()
            if line == b"startxref":
                if not prev.isdigit():
                    raise NoValidXRef(f"bad startxref operand {prev!r}")
                start = int(prev)
                if not (0 <= start < 2**31):
                    raise NoValidXRef(f"startxref out of range: {start}")
                return start
            if line:
                prev = line
        raise NoValidXRef("startxref not found")

    def read_xref_from(self, start: int, seen: Set[int]) -> None:
        if start in seen:
            return
        seen.add(start)
        parser = self.parser
        parser.seek(start)
        parser.reset()
        try:
            pos, token = parser.lexer.nexttoken()
        except LexEOF:
            raise NoValidXRef("EOF at xref position")
        if isinstance(token, int):
            # xref stream
            parser.seek(pos)
            parser.reset()
            xref: Any = XRefStream()
            xref.load(parser)
        else:
            if token is _KW_XREF:
                parser.nextline()
            else:
                parser.seek(pos)
            xref = XRefTable()
            xref.load(parser)
        self.xrefs.append(xref)
        trailer = xref.get_trailer()
        if "XRefStm" in trailer:
            self.read_xref_from(int_value(trailer["XRefStm"]), seen)
        if "Prev" in trailer:
            self.read_xref_from(int_value(trailer["Prev"]), seen)

    # --- object fetch (point lookup on the hash index) ---

    def getobj(self, objid: int) -> Any:
        if not self.xrefs:
            raise ObjectNotFound(objid)
        if objid in self._cached:
            return self._cached[objid][0]
        obj = None
        genno = 0
        for xref in self.xrefs:
            try:
                strmid, index, genno = xref.get_pos(objid)
            except KeyError:
                continue
            try:
                if strmid is not None:
                    stream = stream_value(self.getobj(strmid))
                    obj = self._fetch_from_objstm(stream, index)
                else:
                    obj = self._parse_at(index, objid)
                    if self.decipher:
                        obj = decipher_all(self.decipher, objid, genno, obj)
                if isinstance(obj, StreamObject):
                    obj.set_objid(objid, genno)
                break
            except (LexEOF, ParseError):
                continue
        else:
            raise ObjectNotFound(objid)
        if self.caching:
            self._cached[objid] = (obj, genno)
        return obj

    def _fetch_from_objstm(self, stream: StreamObject, index: int) -> Any:
        key = stream.objid if stream.objid is not None else id(stream)
        if key in self._objstm_cache:
            objs, n = self._objstm_cache[key]
        else:
            n = stream.get("N")
            if not isinstance(n, int):
                if STRICT:
                    raise ParseError(f"/N missing in ObjStm {stream!r}")
                n = 0
            inner = EagerObjectParser(stream.get_data(), self)
            objs = []
            try:
                while True:
                    _, o = inner.nextobject()
                    objs.append(o)
            except LexEOF:
                pass
            if self.caching:
                self._objstm_cache[key] = (objs, n)
        i = n * 2 + index
        if i >= len(objs):
            raise ParseError(f"objstm index too big: {index}")
        return objs[i]

    def _parse_at(self, pos: int, objid: int) -> Any:
        parser = self.parser
        parser.seek(pos)
        parser.reset()
        _, objid1 = parser.lexer.nexttoken()
        _, _genno = parser.lexer.nexttoken()
        _, kwd = parser.lexer.nexttoken()
        if objid1 != objid:
            # malformed-file recovery: scan forward for the real 'N G obj'
            # header (reference pdfdocument.py:810-822)
            seenkw = []
            while kwd is not _KW_OBJ:
                _, kwd = parser.lexer.nexttoken()
                seenkw.append(kwd)
            if len(seenkw) >= 2:
                objid1 = seenkw[-2]
        if objid1 != objid:
            raise ParseError(f"objid mismatch: {objid1!r} != {objid!r}")
        if kwd is not _KW_OBJ:
            raise ParseError(f"no obj keyword at {pos}")
        _, obj = parser.nextobject()
        return obj


# ---------------------------------------------------------------------------
# page source (SURVEY.md §2.1 S4-S5)

_INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")
_US_LETTER = (0.0, 0.0, 612.0, 792.0)


def _parse_rect(value, default) -> Tuple[float, float, float, float]:
    try:
        x0, y0, x1, y1 = (float(resolve1(v)) for v in resolve1(value))
        return (x0, y0, x1, y1)
    except (TypeError, ValueError):
        return default


class Page:
    """One page: attrs with inheritance applied, contents resolved."""

    def __init__(self, doc: Document, pageid: int, attrs: dict) -> None:
        self.doc = doc
        self.pageid = pageid
        self.attrs = dict_value(attrs)
        self.resources = resolve1(self.attrs.get("Resources", {})) or {}
        self.mediabox = _parse_rect(self.attrs.get("MediaBox"), _US_LETTER)
        self.cropbox = _parse_rect(self.attrs.get("CropBox"), self.mediabox)
        contents = resolve1(self.attrs.get("Contents"))
        if contents is None:
            contents = []
        elif not isinstance(contents, list):
            contents = [contents]
        self.contents = contents
        self.rotate = (int_value(self.attrs.get("Rotate", 0)) + 360) % 360


def iter_pages(doc: Document) -> Iterator[Page]:
    """DFS over /Pages with inherited attributes and a cycle guard; falls
    back to a full xref scan for /Type /Page objects."""

    def dfs(node: Any, parent: dict, visited: Set[int]) -> Iterator[Tuple[int, dict]]:
        if isinstance(node, int):
            objid = node
            props = dict_value(doc.getobj(objid)).copy()
        else:
            objid = getattr(node, "objid", id(node))
            props = dict_value(node).copy()
        if objid in visited:
            return
        visited.add(objid)
        for k, v in parent.items():
            if k in _INHERITABLE and k not in props:
                props[k] = v
        typ = props.get("Type")
        if typ is None and not STRICT:
            typ = props.get("type")
        if typ is LITERAL_PAGES and "Kids" in props:
            for child in list_value(props["Kids"]):
                yield from dfs(child, props, visited)
        elif typ is LITERAL_PAGE:
            yield (objid, props)

    emitted = False
    if "Pages" in doc.catalog:
        for objid, props in dfs(doc.catalog["Pages"], doc.catalog, set()):
            yield Page(doc, objid, props)
            emitted = True
    if not emitted:
        for xref in doc.xrefs:
            for objid in xref.get_objids():
                try:
                    obj = doc.getobj(objid)
                except ObjectNotFound:
                    continue
                if isinstance(obj, dict) and obj.get("Type") is LITERAL_PAGE:
                    yield Page(doc, objid, obj)


def get_pages(
    data: bytes,
    password: str = "",
    page_numbers=None,
    maxpages: int = 0,
) -> Iterator[Page]:
    doc = Document(data, password=password)
    for pageno, page in enumerate(iter_pages(doc)):
        if page_numbers and pageno not in page_numbers:
            continue
        yield page
        if maxpages and maxpages <= pageno + 1:
            break
