"""CCITT Group 4 (ITU-T T.6) fax codec — decoder + encoder.

From-scratch design: instead of a per-bit FSM with callback swapping
(reference: pdfminer/ccitt.py:35-72), we keep a bit cursor over the whole
stream and walk small prefix-code tries; changing elements (b1/b2) are
found with ``numpy.searchsorted`` over the previous row's transition
positions instead of per-pixel scans, and rows are packed with
``numpy.packbits``.

The mode / run-length prefix tables are standard data from ITU-T
Recommendations T.4 and T.6, re-serialized under resources/ (see
scripts/extract_ccitt_tables.py).

Semantics parity notes (reference: pdfminer/ccitt.py):
  * only K = -1 (pure G4 / MMR) is supported (ccitt.py:556-568 raises on
    any other K), rows are emitted as 1 bit/pixel with white=1 unless
    ``BlackIs1`` (ccitt.py:546-554);
  * ``EncodedByteAlign`` skips to the next byte boundary after each
    completed row (ccitt.py:343-352, ByteSkip);
  * a pass code taken at line start (a0 = imaginary element before pixel
    0) also paints the *last* pixel of the row — the reference's
    ``range(self._curpos, x1)`` with curpos == -1 wraps to index -1
    (ccitt.py:505-507); we mirror that so valid-but-unusual streams stay
    byte-identical;
  * truncated data (no EOFB) ends the decode silently, discarding any
    partial row (ccitt.py:343-352).
"""

from __future__ import annotations

import numpy as np

__all__ = ["CCITTDecodeError", "ccitt_fax_decode", "g4_decode", "g4_encode"]


class CCITTDecodeError(Exception):
    pass


def _load_tables():
    from pdfminer_six_spark.core.encodings import load_resource

    raw = load_resource("ccitt_codes")

    def trie(table):
        root = {}
        for bits, value in table.items():
            node = root
            for b in bits[:-1]:
                node = node.setdefault(int(b), {})
            node[int(bits[-1])] = ("leaf", value)
        return root

    return {k: trie(v) for k, v in raw.items()}, raw


_TRIES, _RAW_TABLES = _load_tables()
_WHITE_BITS = {v: k for k, v in _RAW_TABLES["white"].items()}
_BLACK_BITS = {v: k for k, v in _RAW_TABLES["black"].items()}
_MODE_BITS = {v: k for k, v in _RAW_TABLES["mode"].items()}

_WHITE = True  # row arrays hold white=True
_EOFB = _MODE_BITS["e"]


class _BitCursor:
    """Bit-granular cursor over a byte string (MSB first)."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).tolist()
        self.pos = 0
        self.n = len(self.bits)

    def read_code(self, trie):
        """Walk a prefix trie; returns the leaf value.

        Returns None on clean end-of-data, raises CCITTDecodeError on an
        undefined prefix (mirrors reference InvalidData, ccitt.py:374-376).
        """
        node = trie
        bits, pos, n = self.bits, self.pos, self.n
        while True:
            if pos >= n:
                return None
            nxt = node.get(bits[pos])
            pos += 1
            if nxt is None:
                self.pos = pos
                raise CCITTDecodeError("undefined code prefix")
            if isinstance(nxt, tuple):
                self.pos = pos
                return nxt[1]
            node = nxt

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _changes_of(row: np.ndarray) -> np.ndarray:
    """Changing-element positions of a row under the imaginary-white-start
    convention: position 0 counts iff row[0] is black; pixel color at
    changes[i] is black for even i, white for odd i."""
    ch = np.flatnonzero(row[1:] != row[:-1]) + 1
    if not row[0]:  # starts black -> change at 0
        ch = np.concatenate(([0], ch))
    return ch


def _b1_b2(changes: np.ndarray, a0: int, color: bool, width: int):
    """First changing element right of a0 with pixel color != color, and
    the one after it (reference scans: ccitt.py:459-507)."""
    i = int(np.searchsorted(changes, a0 + 1, side="left"))
    # pixel at changes[i] is black iff i even; we need pixel != color
    want_black = color  # color white -> we want a black changing element
    if i < len(changes) and ((i % 2 == 0) != want_black):
        i += 1
    b1 = int(changes[i]) if i < len(changes) else width
    b2 = int(changes[i + 1]) if i + 1 < len(changes) else width
    return b1, b2


def g4_decode(
    data: bytes,
    width: int,
    bytealign: bool = False,
    black_is_1: bool = False,
    max_rows: int | None = None,
) -> bytes:
    """Decode a K=-1 CCITTFax (pure 2-D / G4) stream to packed 1-bpp rows,
    ``(width+7)//8`` bytes per row, white=1 unless ``black_is_1``."""
    if width <= 0:
        raise CCITTDecodeError(f"bad Columns: {width}")
    cur = _BitCursor(data)
    ref = np.ones(width, dtype=bool)  # imaginary all-white row above
    ref_changes = _changes_of(ref)
    row = np.ones(width, dtype=bool)
    a0 = -1
    color = _WHITE
    out = []
    mode_trie = _TRIES["mode"]
    white_trie = _TRIES["white"]
    black_trie = _TRIES["black"]
    unc_trie = _TRIES["uncompressed"]

    def flush():
        nonlocal ref, ref_changes, row, a0, color
        out.append(np.packbits(row if not black_is_1 else ~row).tobytes())
        ref = row
        ref_changes = _changes_of(ref)
        row = np.ones(width, dtype=bool)
        a0 = -1
        color = _WHITE
        if bytealign:
            cur.byte_align()

    def read_runlen(first_color: bool) -> int | None:
        n = 0
        trie = white_trie if first_color else black_trie
        while True:
            v = cur.read_code(trie)
            if v is None:
                return None
            n += v
            if v < 64:
                return n

    while max_rows is None or len(out) < max_rows:
        mode = cur.read_code(mode_trie)
        if mode is None or mode == "e":
            break
        if isinstance(mode, int):  # vertical
            b1, _ = _b1_b2(ref_changes, a0, color, width)
            a1 = b1 + mode
            x0 = max(0, a0)
            a1 = max(0, min(width, a1))
            if a1 < x0:
                row[a1:x0] = color
            elif x0 < a1:
                row[x0:a1] = color
            a0 = a1
            color = not color
        elif mode == "h":
            n1 = read_runlen(color)
            if n1 is None:
                break
            n2 = read_runlen(not color)
            if n2 is None:
                break
            x0 = max(0, a0)
            x1 = min(x0 + n1, width)
            x2 = min(x1 + n2, width)
            row[x0:x1] = color
            row[x1:x2] = not color
            a0 = x2
        elif mode == "p":
            b1, b2 = _b1_b2(ref_changes, a0, color, width)
            if a0 < 0 and b2 > a0:
                row[width - 1] = color  # reference curline[-1] wrap, ccitt.py:505-507
            row[max(0, a0) : b2] = color
            a0 = b2
        elif mode == "u":
            while True:
                v = cur.read_code(unc_trie)
                if v is None:
                    a0 = width + 1  # discard partial row
                    break
                if v.startswith("T"):
                    color = bool(int(v[1]))
                    bits = v[2:]
                    done = True
                else:
                    bits = v
                    done = False
                for c in bits:
                    row[a0 if a0 >= 0 else width - 1] = bool(int(c))
                    a0 += 1
                    if a0 >= width:
                        flush()
                if done:
                    break
        else:  # x1..x7 extensions
            raise CCITTDecodeError(f"unsupported extension mode: {mode}")
        if a0 >= width:
            flush()
    return b"".join(out)


def ccitt_fax_decode(data: bytes, params: dict) -> bytes:
    """PDF CCITTFaxDecode filter entry (K=-1 only, like the reference
    ccitt.py:556-568; other K values are left to the caller to pass
    through raw)."""
    k = params.get("K", 0)
    if k != -1:
        raise CCITTDecodeError(f"only K=-1 (G4) supported, got K={k}")
    cols = int(params.get("Columns", 1728))
    # NB: Rows is deliberately ignored, like the reference (ccitt.py:556-568
    # never reads it) — decode runs to EOFB / end of data.
    return g4_decode(
        data,
        cols,
        bytealign=bool(params.get("EncodedByteAlign", False)),
        black_is_1=bool(params.get("BlackIs1", False)),
    )


# ---------------------------------------------------------------------------
# Encoder (round-trip testing + synthetic fixtures)


def _mh_bits(n: int, color: bool) -> str:
    table = _WHITE_BITS if color else _BLACK_BITS
    bits = []
    while n >= 2624:
        bits.append(table[2560])
        n -= 2560
    if n >= 64:
        m = n - (n % 64)
        bits.append(table[m])
        n -= m
    bits.append(table[n])
    return "".join(bits)


def g4_encode(rows: np.ndarray, bytealign: bool = False) -> bytes:
    """Encode a 2-D bool array (True=white) as a K=-1 CCITTFax stream."""
    rows = np.asarray(rows, dtype=bool)
    height, width = rows.shape
    bits: list[str] = []
    ref = np.ones(width, dtype=bool)
    for y in range(height):
        row = rows[y]
        ref_changes = _changes_of(ref)
        row_changes = _changes_of(row)
        a0 = -1
        color = _WHITE
        while a0 < width:
            # a1: where the current-color run (starting at a0) ends
            j = int(np.searchsorted(row_changes, a0 + 1, side="left"))
            if j < len(row_changes) and ((j % 2 == 0) != color):
                j += 1
            a1 = int(row_changes[j]) if j < len(row_changes) else width
            b1, b2 = _b1_b2(ref_changes, a0, color, width)
            if b2 < a1:
                bits.append(_MODE_BITS["p"])
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits.append(_MODE_BITS[a1 - b1])
                a0 = a1
                color = not color
            else:
                a2 = int(row_changes[j + 1]) if j + 1 < len(row_changes) else width
                bits.append(_MODE_BITS["h"])
                bits.append(_mh_bits(a1 - max(a0, 0), color))
                bits.append(_mh_bits(a2 - a1, not color))
                a0 = a2
        if bytealign:
            total = sum(len(b) for b in bits)
            bits.append("0" * (-total % 8))
        ref = row
    bits.append(_EOFB)
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return np.packbits(
        np.frombuffer(s.encode("ascii"), dtype=np.uint8) - ord("0")
    ).tobytes()
