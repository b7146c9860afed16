"""PostScript/PDF tokenizer.

Token semantics replicate the reference lexer (pdfminer.six
pdfminer/psparser.py:256-506: dispatch table, name ``#xx`` escapes, number
int->float promotion, literal-string escapes/octal/line-continuation, hex
strings with odd-digit handling, ``<<``/``>>`` lookahead, NUL skip, 1-char
fallback keywords) — validated token-for-token against the reference's own
regression vectors (tests/test_pdfminer_psparser.py).

The *architecture* is different by design: the reference runs a resumable
function-pointer state machine over 4 KiB file buffers; here payloads arrive
as in-memory ``bytes`` from an Arrow batch, so we scan the whole buffer with
precompiled regexes and an index cursor — no buffering states, no
token-across-buffer edge cases, and much less per-token Python overhead.
"""

from __future__ import annotations

import re
from typing import Any, Iterator, List, Optional, Tuple

from pdfminer_six_spark.core.objects import KWD, LIT, LexEOF

# master scan: whitespace/comments skipped; one token class per alternative
_SKIP = re.compile(rb"(?:\s+|%[^\r\n]*|\x00+)+")
_NUMBER = re.compile(rb"[-+0-9][0-9]*(\.[0-9]*)?")
_KEYWORD = re.compile(rb"[A-Za-z][^#/%\[\]()<>{}\s]*")
_NAME_RUN = re.compile(rb"[^#/%\[\]()<>{}\s]*")
_HEXDIGITS = re.compile(rb"[0-9A-Fa-f]{1,2}")
_STRING_SPECIAL = re.compile(rb"[()\\]")
_OCTAL = re.compile(rb"[0-7]{1,3}")
_HEXSTR_BODY = re.compile(rb"[\s0-9A-Fa-f]*")
_FLOAT_TAIL = re.compile(rb"[0-9]*")
_EOL = re.compile(rb"\r\n|[\r\n]")

_ESCAPES = {
    0x62: b"\x08",  # \b
    0x74: b"\x09",  # \t
    0x6E: b"\x0a",  # \n
    0x66: b"\x0c",  # \f
    0x72: b"\x0d",  # \r
    0x28: b"(",
    0x29: b")",
    0x5C: b"\\",
}

KEYWORD_DICT_BEGIN = KWD(b"<<")
KEYWORD_DICT_END = KWD(b">>")
KEYWORD_ARRAY_BEGIN = KWD(b"[")
KEYWORD_ARRAY_END = KWD(b"]")
KEYWORD_PROC_BEGIN = KWD(b"{")
KEYWORD_PROC_END = KWD(b"}")

Token = Any  # int | float | bool | bytes | Name | Keyword


class Lexer:
    """Tokenize a bytes buffer; yields (pos, token)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def seek(self, pos: int) -> None:
        self.pos = pos

    def tell(self) -> int:
        return self.pos

    # --- line-oriented access (used by xref & stream carve-out) ---

    def nextline(self) -> Tuple[int, bytes]:
        """Next \r|\n|\r\n-terminated line from the cursor."""
        data, i = self.data, self.pos
        if i >= len(data):
            raise LexEOF("EOF in nextline")
        m = _EOL.search(data, i)
        if m is None:
            self.pos = len(data)
            return (i, data[i:])
        end = m.end()
        self.pos = end
        return (i, data[i:end])

    def nexttoken(self) -> Tuple[int, Token]:
        data = self.data
        n = len(data)
        pos = self.pos
        while True:
            m = _SKIP.match(data, pos)
            if m:
                pos = m.end()
            if pos >= n:
                self.pos = pos
                raise LexEOF("EOF")
            c = data[pos]
            start = pos
            if c == 0x2F:  # /name
                tok, pos = self._scan_name(pos + 1)
                self.pos = pos
                return (start, tok)
            if 0x30 <= c <= 0x39 or c in (0x2B, 0x2D):  # number
                m = _NUMBER.match(data, pos)
                assert m is not None
                text = m.group(0)
                pos = m.end()
                self.pos = pos
                try:
                    val = float(text) if m.group(1) is not None else int(text)
                except ValueError:
                    continue  # malformed (e.g. lone '+') — token dropped
                return (start, val)
            if c == 0x2E:  # .float
                m = _FLOAT_TAIL.match(data, pos + 1)
                assert m is not None
                pos = m.end()
                self.pos = pos
                try:
                    return (start, float(data[start:pos]))
                except ValueError:
                    continue
            if (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A):  # keyword
                m = _KEYWORD.match(data, pos)
                assert m is not None
                word = m.group(0)
                self.pos = pos = m.end()
                if word == b"true":
                    return (start, True)
                if word == b"false":
                    return (start, False)
                return (start, KWD(word))
            if c == 0x28:  # ( literal string
                tok, pos = self._scan_string(pos + 1)
                self.pos = pos
                if tok is None:
                    raise LexEOF("EOF in string")
                return (start, tok)
            if c == 0x3C:  # < — dict-open or hex string
                if data[pos + 1 : pos + 2] == b"<":
                    self.pos = pos + 2
                    return (start, KEYWORD_DICT_BEGIN)
                tok, pos = self._scan_hexstring(pos + 1)
                self.pos = pos
                if tok is None:
                    raise LexEOF("EOF in hex string")
                return (start, tok)
            if c == 0x3E:  # > — dict-close or stray (dropped)
                if data[pos + 1 : pos + 2] == b">":
                    self.pos = pos + 2
                    return (start, KEYWORD_DICT_END)
                pos += 1
                continue
            # any other byte: 1-char keyword
            self.pos = pos + 1
            return (start, KWD(data[pos : pos + 1]))

    def __iter__(self) -> Iterator[Tuple[int, Token]]:
        while True:
            try:
                yield self.nexttoken()
            except LexEOF:
                return

    # --- sub-scanners ---

    def _scan_name(self, pos: int) -> Tuple[Any, int]:
        data = self.data
        n = len(data)
        parts: List[bytes] = []
        while True:
            m = _NAME_RUN.match(data, pos)
            assert m is not None
            parts.append(m.group(0))
            pos = m.end()
            if data[pos : pos + 1] != b"#":
                break
            h = _HEXDIGITS.match(data, pos + 1)
            if h:
                parts.append(bytes((int(h.group(0), 16),)))
                pos = h.end()
            else:
                pos += 1  # bare '#' is dropped, name continues
            if pos >= n:
                # EOF directly after a '#' escape: the reference's one-shot
                # EOF flush exits the hex sub-state without emitting, so the
                # whole name token is lost (psparser.py:337-345 + :489-503)
                raise LexEOF("EOF in name hex escape")
        raw = b"".join(parts)
        try:
            name: Any = raw.decode("utf-8")
        except UnicodeDecodeError:
            name = raw
        return (LIT(name), pos)

    def _scan_string(self, pos: int) -> Tuple[Optional[bytes], int]:
        data = self.data
        n = len(data)
        depth = 1
        out: List[bytes] = []
        while True:
            m = _STRING_SPECIAL.search(data, pos)
            if m is None:
                return (None, n)  # unterminated: token lost (as reference)
            j = m.start()
            out.append(data[pos:j])
            c = data[j]
            if c == 0x28:  # (
                depth += 1
                out.append(b"(")
                pos = j + 1
            elif c == 0x29:  # )
                depth -= 1
                if depth:
                    out.append(b")")
                    pos = j + 1
                else:
                    return (b"".join(out), j + 1)
            else:  # backslash escape
                pos = j + 1
                if pos >= n:
                    return (None, n)
                e = data[pos]
                o = _OCTAL.match(data, pos)
                if o:
                    out.append(bytes((int(o.group(0), 8) & 0xFF,)))
                    pos = o.end()
                elif e in _ESCAPES:
                    out.append(_ESCAPES[e])
                    pos += 1
                elif e == 0x0D and data[pos + 1 : pos + 2] == b"\n":
                    pos += 2  # \<CRLF> line continuation
                else:
                    pos += 1  # any other escaped char is dropped (incl. \<LF>)

    def _scan_hexstring(self, pos: int) -> Tuple[Optional[bytes], int]:
        data = self.data
        m = _HEXSTR_BODY.match(data, pos)
        assert m is not None
        body = re.sub(rb"\s", b"", m.group(0))
        pos = m.end()
        if pos >= len(data):
            return (None, pos)  # EOF before terminator: token lost
        out = bytearray()
        i = 0
        L = len(body)
        while i < L:
            pair = body[i : i + 2]
            out.append(int(pair, 16))
            i += 2
        # the stop char (usually '>') is NOT consumed: the reference leaves
        # it for the dispatcher, so '<..>>' yields the hex string AND '>>'
        # (psparser.py:467-480 returns at j; wclose handles the '>')
        return (bytes(out), pos)


def reverse_lines(data: bytes) -> Iterator[bytes]:
    """Yield lines scanning backwards from EOF (finding startxref/trailer;
    reference semantics psparser.py:232-254)."""
    end = len(data)
    while end > 0:
        n = max(data.rfind(b"\r", 0, end), data.rfind(b"\n", 0, end))
        if n == -1:
            yield data[:end]
            return
        yield data[n:end]
        end = n
