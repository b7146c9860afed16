"""JBIG2 (ITU-T T.88) segment stream: embedded→standalone conversion.

PDF embeds JBIG2 images as a bare sequence of segments (plus an optional
shared ``JBIG2Globals`` stream).  A standalone ``.jb2`` file adds a file
header and end-of-page / end-of-file segments.  This module parses segment
headers, then re-emits the stream in the standalone "sequential
organization" layout.

Output is byte-compatible with the reference exporter so its golden file
(samples/contrib/XIPLAYER0.jb2) matches exactly; we deliberately mirror two
of its off-spec encoding choices (reference: pdfminer/jbig2.py):

  * referred-segment numbers use 1 byte when the segment number <= 256 and
    otherwise 4 bytes — the spec's 2-byte middle tier is not used
    (jbig2.py:147-155 packs ">I", which is 4 bytes);
  * long-form retention flags (>4 referred segments) are re-emitted 8 bits
    per byte even though the reference reader only keeps 7 bits per byte
    (jbig2.py:142-144 vs :318-325); we parse all 8 so round-trips of
    long-form headers are lossless, which is a superset of the reference's
    behavior on the inputs it can itself round-trip.

Segment header layout (T.88 §7.2): number u32, flags u8 (type in bits 0-5,
page-association-size in bit 6, deferred in bit 7), referred-to count +
retention bits, referred segment numbers, page association (u8 or u32),
data length u32 (0xFFFFFFFF = unknown, unsupported here like
jbig2.py:183-189).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List

__all__ = ["JBIG2Error", "Segment", "parse_segments", "embedded_to_file"]

_FILE_MAGIC = b"\x97\x4a\x42\x32\x0d\x0a\x1a\x0a"
_SEQUENTIAL = 0x01
_TYPE_END_OF_PAGE = 49
_TYPE_END_OF_FILE = 51
_UNKNOWN_LEN = 0xFFFFFFFF


class JBIG2Error(Exception):
    pass


@dataclass
class Segment:
    number: int
    type: int
    deferred: bool
    page_assoc_long: bool
    retain_bits: List[bool]
    referred: List[int]
    page_assoc: int
    data: bytes = b""

    @property
    def long_form(self) -> bool:
        return len(self.referred) > 4


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise JBIG2Error("truncated segment header")
        self.pos += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack(">L", self.take(4))[0]


def parse_segments(data: bytes) -> List[Segment]:
    """Parse a bare (PDF-embedded) JBIG2 segment sequence.  A trailing
    truncated header is dropped, like the reference reader
    (jbig2.py:87-104 sets _error and skips)."""
    r = _Reader(data)
    segments: List[Segment] = []
    while not r.eof():
        try:
            number = r.u32()
            flags = r.u8()
            seg_type = flags & 0x3F
            page_assoc_long = bool(flags & 0x40)
            deferred = bool(flags & 0x80)

            first = r.u8()
            count = first >> 5
            retain: List[bool] = []
            if count < 7:
                retain = [bool((first >> i) & 1) for i in range(5)]
            else:
                count = struct.unpack(">L", bytes([first]) + r.take(3))[0] & 0x1FFFFFFF
                for _ in range((count + 8) // 8):  # ceil((count+1)/8)
                    b = r.u8()
                    retain.extend(bool((b >> i) & 1) for i in range(8))
            if number <= 256:
                referred = [r.u8() for _ in range(count)]
            else:
                referred = [r.u32() for _ in range(count)]

            page = r.u32() if page_assoc_long else r.u8()
            length = r.u32()
            if length == _UNKNOWN_LEN:
                raise JBIG2Error("unknown segment data length is unsupported")
            payload = r.take(length) if length else b""
        except JBIG2Error:
            if segments and r.pos >= len(r.buf):
                break  # trailing garbage / truncated header
            raise
        segments.append(
            Segment(
                number=number,
                type=seg_type,
                deferred=deferred,
                page_assoc_long=page_assoc_long,
                retain_bits=retain,
                referred=referred,
                page_assoc=page,
                data=payload,
            ),
        )
    return segments


def encode_segment(seg: Segment) -> bytes:
    out = [struct.pack(">L", seg.number)]
    flags = (seg.type & 0x3F) | (0x40 if seg.page_assoc_long else 0)
    if seg.deferred:
        flags |= 0x80
    out.append(struct.pack(">B", flags))

    n = len(seg.referred)
    if n <= 4:
        first = n << 5
        for i, bit in enumerate(seg.retain_bits[:5]):
            if bit:
                first |= 1 << i
        out.append(struct.pack(">B", first))
    else:
        out.append(struct.pack(">L", (7 << 29) | n))
        nbytes = (n + 8) // 8
        for bi in range(nbytes):
            b = 0
            for i, bit in enumerate(seg.retain_bits[bi * 8 : bi * 8 + 8]):
                if bit:
                    b |= 1 << i
            out.append(struct.pack(">B", b))
    fmt = ">B" if seg.number <= 256 else ">L"
    for ref in seg.referred:
        out.append(struct.pack(fmt, ref))

    # the reference writer always emits a 1-byte page association
    # (jbig2.py:271-279 has no page_assoc encoder, so ">B" applies); a
    # long page association would not survive — fail loudly instead.
    if seg.page_assoc > 255:
        raise JBIG2Error("page association > 255 not supported in export")
    out.append(struct.pack(">B", seg.page_assoc))
    out.append(struct.pack(">L", len(seg.data)))
    out.append(seg.data)
    return b"".join(out)


def _end_segment(number: int, seg_type: int, page: int) -> Segment:
    return Segment(
        number=number,
        type=seg_type,
        deferred=False,
        page_assoc_long=False,
        retain_bits=[],
        referred=[],
        page_assoc=page,
        data=b"",
    )


def embedded_to_file(embedded: bytes, globals_data: bytes = b"") -> bytes:
    """Wrap PDF-embedded JBIG2 data (optionally prefixed by its Globals
    stream, newline-stripped like the reference image.py:206-210) into a
    standalone sequential-organization file with page count 1, appending
    an end-of-page segment when the last page is left open and always an
    end-of-file segment (numbered last+2 regardless, mirroring
    image.py/jbig2.py write_file's fixed offset, jbig2.py:258-263)."""
    stream = globals_data.rstrip(b"\n") + embedded if globals_data else embedded
    segments = parse_segments(stream)

    out = [_FILE_MAGIC, struct.pack(">B", _SEQUENTIAL), struct.pack(">L", 1)]
    current_page = 0
    last_num = 0
    for seg in segments:
        out.append(encode_segment(seg))
        last_num = seg.number
        if seg.type == _TYPE_END_OF_PAGE:
            current_page = 0
        elif seg.page_assoc:
            current_page = seg.page_assoc
    if segments and current_page:
        out.append(
            encode_segment(_end_segment(last_num + 1, _TYPE_END_OF_PAGE, current_page)),
        )
    out.append(encode_segment(_end_segment(last_num + 2, _TYPE_END_OF_FILE, 0)))
    return b"".join(out)
