"""Object assembly on top of the tokenizer.

Replicates the reference's stack-assembly semantics (pdfminer.six
psparser.py:522-651 ``nextobject``; pdfparser.py:56-133 PDF keywords ``R`` /
``stream`` / ``endobj``; pdfinterp.py:256-360 content-stream parsing with
``BI/ID/EI`` inline images) with an independent, in-memory implementation.
"""

from __future__ import annotations

import re
from io import BytesIO
from typing import Any, List, Optional, Sequence, Tuple

from pdfminer_six_spark.core.lexer import (
    KEYWORD_ARRAY_BEGIN,
    KEYWORD_ARRAY_END,
    KEYWORD_DICT_BEGIN,
    KEYWORD_DICT_END,
    KEYWORD_PROC_BEGIN,
    KEYWORD_PROC_END,
    Lexer,
)
from pdfminer_six_spark.core.objects import (
    KWD,
    STRICT,
    Keyword,
    LexEOF,
    Name,
    ObjRef,
    ParseError,
    StreamObject,
    choppairs,
    dict_value,
    int_value,
    name_str,
    resolve1,
    safe_int,
    stream_value,
)

_KW_R = KWD(b"R")
_KW_NULL = KWD(b"null")
_KW_OBJ = KWD(b"obj")
_KW_ENDOBJ = KWD(b"endobj")
_KW_STREAM = KWD(b"stream")
_KW_XREF = KWD(b"xref")
_KW_STARTXREF = KWD(b"startxref")
_KW_BI = KWD(b"BI")
_KW_ID = KWD(b"ID")
_KW_EI = KWD(b"EI")


class StackParser:
    """Assembles scalars/arrays/dicts/procs from a token stream."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.lexer = Lexer(data, pos)
        self.reset()

    def reset(self) -> None:
        self.stack: List[Tuple[int, Any]] = []
        self.frames: List[Tuple[int, Optional[str], List[Tuple[int, Any]]]] = []
        self.curtype: Optional[str] = None
        self.results: List[Tuple[int, Any]] = []

    def seek(self, pos: int) -> None:
        self.lexer.seek(pos)
        self.reset()

    def tell(self) -> int:
        return self.lexer.tell()

    def nextline(self) -> Tuple[int, bytes]:
        return self.lexer.nextline()

    # stack helpers
    def push(self, *items: Tuple[int, Any]) -> None:
        self.stack.extend(items)

    def pop(self, n: int) -> List[Tuple[int, Any]]:
        items = self.stack[-n:]
        del self.stack[-n:]
        return items

    def popall(self) -> List[Tuple[int, Any]]:
        items = self.stack
        self.stack = []
        return items

    def add_results(self, *items: Tuple[int, Any]) -> None:
        self.results.extend(items)

    def open_frame(self, pos: int, ftype: str) -> None:
        self.frames.append((pos, self.curtype, self.stack))
        self.curtype = ftype
        self.stack = []

    def close_frame(self, ftype: str) -> Tuple[int, List[Any]]:
        if self.curtype != ftype:
            raise ParseError(f"frame mismatch: {self.curtype!r} != {ftype!r}")
        values = [v for (_, v) in self.stack]
        pos, self.curtype, self.stack = self.frames.pop()
        return (pos, values)

    def flush(self) -> None:
        """What reaches ``results`` when the stack unwinds at depth 0.
        Default: nothing (objects accumulate until a keyword flushes them)."""

    def do_keyword(self, pos: int, token: Keyword) -> None:
        pass

    def nextobject(self) -> Tuple[int, Any]:
        while not self.results:
            pos, token = self.lexer.nexttoken()  # raises LexEOF at end
            if isinstance(token, (int, float, bool, str, bytes, Name)):
                # inlined self.push((pos, token)) — the dominant branch;
                # self.stack is the CURRENT frame's list (rebound by
                # open_frame/close_frame), so look it up per call
                self.stack.append((pos, token))
            elif token is KEYWORD_ARRAY_BEGIN:
                self.open_frame(pos, "a")
            elif token is KEYWORD_ARRAY_END:
                try:
                    self.push(self.close_frame("a"))
                except ParseError:
                    if STRICT:
                        raise
            elif token is KEYWORD_DICT_BEGIN:
                self.open_frame(pos, "d")
            elif token is KEYWORD_DICT_END:
                try:
                    dpos, values = self.close_frame("d")
                    if len(values) % 2 != 0:
                        raise ParseError(f"odd dict: {values!r}")
                    d = {
                        name_str(k): v
                        for (k, v) in choppairs(values)
                        if v is not None
                    }
                    self.push((dpos, d))
                except ParseError:
                    if STRICT:
                        raise
            elif token is KEYWORD_PROC_BEGIN:
                self.open_frame(pos, "p")
            elif token is KEYWORD_PROC_END:
                try:
                    self.push(self.close_frame("p"))
                except ParseError:
                    if STRICT:
                        raise
            else:
                self.do_keyword(pos, token)
            if not self.frames:
                self.flush()
        return self.results.pop(0)


class ObjectParser(StackParser):
    """Parses body objects of a PDF file (indirect objects, xref sections).

    ``doc`` supplies indirect-ref resolution and the decipher callable.
    """

    def __init__(self, data: bytes, doc=None, pos: int = 0) -> None:
        super().__init__(data, pos)
        self.doc = doc
        self.fallback = False

    def set_document(self, doc) -> None:
        self.doc = doc

    def do_keyword(self, pos: int, token: Keyword) -> None:
        if token is _KW_XREF or token is _KW_STARTXREF:
            self.add_results(*self.pop(1))
        elif token is _KW_ENDOBJ:
            self.add_results(*self.pop(4))
        elif token is _KW_NULL:
            self.push((pos, None))
        elif token is _KW_R:
            if len(self.stack) >= 2:
                ((_, objid_raw), _) = self.pop(2)
                objid = safe_int(objid_raw)
                if objid is not None:
                    self.push((pos, ObjRef(self.doc, objid)))
        elif token is _KW_STREAM:
            self._carve_stream(pos)
        else:
            self.push((pos, token))

    def _carve_stream(self, pos: int) -> None:
        """Read `/Length` raw bytes after the ``stream`` EOL (or scan to
        ``endstream`` when lying/absent — reference pdfparser.py:76-132)."""
        popped = self.pop(1)
        if not popped:
            raise ParseError("stream without dictionary")
        (_, dic) = popped[0]
        dic = dict_value(dic)
        objlen = 0
        if not self.fallback:
            try:
                objlen = int_value(dic["Length"])
            except KeyError:
                if STRICT:
                    raise ParseError(f"/Length undefined: {dic!r}")
        self.lexer.seek(pos)
        try:
            (_, line) = self.lexer.nextline()  # the 'stream' keyword line
        except LexEOF:
            if STRICT:
                raise
            return
        data_start = pos + len(line)
        data = bytearray(self.lexer.data[data_start : data_start + objlen])
        self.lexer.seek(data_start + objlen)
        while True:
            try:
                (_, line) = self.lexer.nextline()
            except LexEOF:
                if STRICT:
                    raise ParseError("EOF looking for endstream")
                break
            if b"endstream" in line:
                i = line.index(b"endstream")
                objlen += i
                if self.fallback:
                    data += line[:i]
                break
            objlen += len(line)
            if self.fallback:
                data += line
        pos_after = data_start + objlen
        # the reference's carve repositions via PSStackParser.seek, which
        # RESETS stack/frames/results (psparser.py:527-535) — that discard
        # is what lets it recover cleanly from glued "endobjNN 0 obj"
        # garbage between objects (e.g. samples/simple5.pdf), so mirror it
        self.reset()
        self.lexer.seek(pos_after)
        decipher = self.doc.decipher if self.doc is not None else None
        self.push((data_start, StreamObject(dic, bytes(data), decipher)))


class ContentParser(StackParser):
    """Parses a page's content — the concatenation of already-decoded
    content streams — flushing eagerly so operators interleave with operands
    (reference pdfinterp.py:256-360)."""

    def __init__(self, streams: Sequence[Any]) -> None:
        parts = []
        for s in streams:
            strm = stream_value(s)
            parts.append(strm.get_data())
        super().__init__(b"\n".join(parts))

    def flush(self) -> None:
        # called once per depth-0 token (hot path): skip the popall/extend
        # churn when nothing is stacked
        if self.stack:
            self.results.extend(self.stack)
            self.stack = []

    def do_keyword(self, pos: int, token: Keyword) -> None:
        if token is _KW_BI:
            self.open_frame(pos, "inline")
        elif token is _KW_ID:
            try:
                _, values = self.close_frame("inline")
                if len(values) % 2 != 0:
                    raise ParseError(f"odd inline dict: {values!r}")
                d = {name_str(k): resolve1(v) for (k, v) in choppairs(values)}
                eos = b"EI"
                filt = d.get("F")
                if filt is not None:
                    if isinstance(filt, Name):
                        filt = [filt]
                    if filt and name_str(filt[0]) in ("ASCII85Decode", "A85"):
                        eos = b"~>"
                pos2, data = self._inline_data(self.lexer.tell(), eos)
                if eos == b"~>":
                    data += eos  # terminator participates in a85 decode
                self.push((pos2, StreamObject(d, data)))
                if eos == b"EI":
                    self.push((pos2, _KW_EI))
            except ParseError:
                if STRICT:
                    raise
        else:
            self.push((pos, token))

    def _inline_data(self, pos: int, target: bytes) -> Tuple[int, bytes]:
        """Scan raw bytes for the terminator followed by whitespace
        (reference pdfinterp.py:294-322 semantics: target then one space)."""
        data = self.lexer.data
        i = pos + 1  # exactly one separator byte after 'ID'
        search = i
        while True:
            j = data.find(target, search)
            if j == -1:
                payload = data[i:]
                self.lexer.seek(len(data))
                return (pos, payload)
            after = data[j + len(target) : j + len(target) + 1]
            if after == b"" or after.isspace():
                payload = data[i:j]
                payload = re.sub(rb"(\x0d\x0a|[\x0d\x0a])$", b"", payload)
                self.lexer.seek(j + len(target))
                return (pos, payload)
            search = j + 1
