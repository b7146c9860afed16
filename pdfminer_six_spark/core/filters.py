"""Stream decode filters (SURVEY.md §2.5).

Semantics match the reference (pdfminer.six pdftypes.py:309-397 dispatcher,
lzw.py, ascii85.py, runlength.py, utils.py:125-245 predictors) including the
corrupted-zlib salvage path (pdftypes.py:221-240).  Implementation is our
own; the PNG "Up" predictor row-add is numpy-vectorized since it dominates
xref-stream decoding.
"""

from __future__ import annotations

import re
import zlib
from base64 import a85decode
from binascii import unhexlify

import numpy as np

from pdfminer_six_spark.core.objects import PDFError, STRICT


class FilterError(PDFError):
    pass


def flatedecode(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error as e:
        if STRICT:
            raise FilterError(f"bad zlib data: {e!r}") from e
        try:
            return _zlib_salvage(data)
        except zlib.error:
            return b""


def _zlib_salvage(data: bytes) -> bytes:
    """Recover the decodable prefix of a zlib stream whose tail (checksum
    area) is corrupt: feed byte-at-a-time, forgive errors within the last
    3 bytes only."""
    d = zlib.decompressobj()
    out = []
    try:
        for i in range(len(data)):
            out.append(d.decompress(data[i : i + 1]))
    except zlib.error:
        if i < len(data) - 3:
            raise
    return b"".join(out)


_A85_HEAD = re.compile(rb"^\s*<?\s*~\s*")
_A85_TAIL = re.compile(rb"\s*~\s*>?\s*$")
# stdlib a85decode's default ignorechars (base64.py): space \t \n \r \v
_A85_WS = b" \t\n\r\x0b"
_A85_POW = np.array(
    [85**4, 85**3, 85**2, 85, 1], dtype=np.uint64
).reshape(1, 5)


def _a85_fast(body: bytes) -> bytes:
    """Vectorized ASCII85 decode of a whitespace/'~'-stripped body.
    Returns None when the input needs stdlib semantics (invalid chars,
    mid-group 'z', 1-char tail, 32-bit overflow — all error paths), so
    the caller falls back to ``base64.a85decode`` and raises byte-for-
    byte the same exceptions.  Per-call decode cost dominated the
    extraction kernel profile (stdlib's pure-Python 5-char loop was
    ~13% of _extract_one); this path does the whole stream in a few
    numpy ops."""
    arr = np.frombuffer(body.translate(None, _A85_WS), dtype=np.uint8)
    zpos = np.nonzero(arr == 0x7A)[0]  # b'z'
    if len(zpos):
        # 'z' is only legal on a group boundary: chars before it minus
        # prior z's (each standing for a full group of 5) must be = 0
        # mod 5.  Anything else is stdlib's error path.
        prior = np.arange(len(zpos), dtype=np.int64)
        if ((zpos - prior + prior * 5) % 5).any():
            return None
        # expand each z to '!!!!!' (value 0 -> 4 zero bytes: identical)
        out = np.full(len(arr) + 4 * len(zpos), 0x21, dtype=np.uint8)
        keep = np.ones(len(out), dtype=bool)
        shifted = zpos + 4 * prior  # z positions in the expanded array
        for off in range(5):
            keep[shifted + off] = False
        out[keep] = arr[arr != 0x7A]
        arr = out
    n = len(arr)
    if n == 0:
        return b""
    pad = (-n) % 5
    if pad == 4:  # 1-char final group: stdlib raises
        return None
    digits = arr.astype(np.int16) - 33
    if digits.min() < 0 or digits.max() > 84:
        return None
    if pad:
        digits = np.concatenate(
            [digits, np.full(pad, 84, dtype=np.int16)]  # 'u' = 117-33
        )
    vals = (digits.astype(np.uint64).reshape(-1, 5) * _A85_POW).sum(axis=1)
    if vals.max() > 0xFFFFFFFF:
        return None
    be = vals.astype(">u4").view(np.uint8).tobytes()
    return be[: len(be) - pad] if pad else be


def ascii85decode(data: bytes) -> bytes:
    body = _A85_TAIL.sub(b"", _A85_HEAD.sub(b"", data))
    if len(body) < 512:  # numpy setup outweighs the loop on tiny streams
        return a85decode(body)
    out = _a85_fast(body)
    if out is None:  # error-shaped input: identical stdlib behavior
        return a85decode(body)
    return out


def asciihexdecode(data: bytes) -> bytes:
    data = re.sub(rb"\s", b"", data)
    gt = data.find(b">")
    if gt != -1:
        data = data[:gt]
        if gt % 2 == 1:
            data += b"0"
    return unhexlify(data)


def rldecode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:
            if i + 1 < n:
                out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def lzwdecode(data: bytes) -> bytes:
    """LZW per PDF spec / TIFF flavor: codes start at 9 bits, table entries
    256=clear 257=EOD, width bumps at table sizes 511/1023/2047."""
    out = []
    table: list = []
    prev = b""
    nbits = 9
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    while True:
        while bitcnt < nbits:
            if pos >= n:
                return b"".join(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - nbits)) & ((1 << nbits) - 1)
        bitcnt -= nbits
        if code == 256:
            table = [bytes((c,)) for c in range(256)] + [None, None]
            prev = b""
            nbits = 9
            continue
        if code == 257:
            continue
        if not prev:
            if code >= len(table):
                return b"".join(out)  # corrupt: stop like the reference
            x = table[code]
            prev = x
        else:
            if code < len(table):
                x = table[code]
                table.append(prev + x[:1])
            elif code == len(table):
                table.append(prev + prev[:1])
                x = table[code]
            else:
                return b"".join(out)
            if len(table) == 511:
                nbits = 10
            elif len(table) == 1023:
                nbits = 11
            elif len(table) == 2047:
                nbits = 12
            prev = x
        out.append(x)


def ccittfaxdecode(data: bytes, params: dict) -> bytes:
    """CCITT fax is image-pixel data; the text path never touches it, but
    image export (core/image.py) does.  K=-1 (G4) is decoded for real
    (core/ccitt.py, differentially fuzzed against the reference); other K
    values degrade to raw pass-through where the reference raises
    mid-get_data (ccitt.py:556-568)."""
    from pdfminer_six_spark.core.ccitt import CCITTDecodeError, ccitt_fax_decode

    try:
        return ccitt_fax_decode(data, params)
    except CCITTDecodeError:
        return data


_FILTER_FNS = {
    "FlateDecode": lambda d, p: flatedecode(d),
    "LZWDecode": lambda d, p: lzwdecode(d),
    "ASCII85Decode": lambda d, p: ascii85decode(d),
    "ASCIIHexDecode": lambda d, p: asciihexdecode(d),
    "RunLengthDecode": lambda d, p: rldecode(d),
    "CCITTFaxDecode": ccittfaxdecode,
}


def apply_filter(name: str, data: bytes, params: dict) -> bytes:
    fn = _FILTER_FNS.get(name)
    if fn is None:
        if STRICT:
            raise FilterError(f"unsupported filter {name!r}")
        return data
    return fn(data, params)


def apply_predictor(
    pred: int, colors: int, columns: int, bpc: int, data: bytes
) -> bytes:
    if pred == 1 or pred == 0:
        return data
    if pred == 2:
        return _tiff_predictor(colors, columns, bpc, data)
    if pred >= 10:
        return _png_predictor(colors, columns, bpc, data)
    raise FilterError(f"unsupported predictor {pred!r}")


def _tiff_predictor(colors: int, columns: int, bpc: int, data: bytes) -> bytes:
    if bpc != 8:
        raise FilterError(f"TIFF predictor needs 8 bpc, got {bpc}")
    bpp = colors
    nbytes = columns * bpp
    nrows = len(data) // nbytes if nbytes else 0
    arr = np.frombuffer(data[: nrows * nbytes], dtype=np.uint8).reshape(
        nrows, columns, bpp
    ).astype(np.int64)
    np.cumsum(arr, axis=1, out=arr)
    return (arr % 256).astype(np.uint8).tobytes() + data[nrows * nbytes :]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_predictor(colors: int, columns: int, bpc: int, data: bytes) -> bytes:
    if bpc not in (8, 1):
        raise FilterError(f"PNG predictor needs 8/1 bpc, got {bpc}")
    nbytes = colors * columns * bpc // 8
    bpp = colors * bpc // 8
    rows = []
    # NOTE: the reference seeds the prior scanline with `columns` zero bytes
    # (utils.py:170) even though scanlines are `nbytes` long; for the
    # ubiquitous xref-stream case colors=1/bpc=8 they coincide.
    above = np.zeros(max(nbytes, columns), dtype=np.uint16)[:nbytes]
    stride = nbytes + 1
    for start in range(0, len(data), stride):
        ftype = data[start]
        line = np.frombuffer(
            data[start + 1 : start + 1 + nbytes], dtype=np.uint8
        ).astype(np.uint16)
        if ftype == 0:
            raw = line
        elif ftype == 2:  # Up — vectorized: raw = line + prior (mod 256)
            raw = (line + above[: len(line)]) & 255
        elif ftype == 1:  # Sub
            raw = line.copy()
            for j in range(bpp, len(raw)):
                raw[j] = (raw[j] + raw[j - bpp]) & 255
        elif ftype == 3:  # Average
            raw = line.copy()
            for j in range(len(raw)):
                left = int(raw[j - bpp]) if j >= bpp else 0
                up = int(above[j]) if j < len(above) else 0
                raw[j] = (raw[j] + (left + up) // 2) & 255
        elif ftype == 4:  # Paeth
            raw = line.copy()
            for j in range(len(raw)):
                left = int(raw[j - bpp]) if j >= bpp else 0
                up = int(above[j]) if j < len(above) else 0
                ul = int(above[j - bpp]) if (j >= bpp and j - bpp < len(above)) else 0
                raw[j] = (raw[j] + _paeth(left, up, ul)) & 255
        else:
            raise FilterError(f"unsupported PNG filter type {ftype}")
        rows.append(raw.astype(np.uint8))
        above = raw
    if not rows:
        return b""
    return np.concatenate(rows).tobytes()
