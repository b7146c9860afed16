"""CFF (Compact Font Format) parser: INDEX / DICT / charset / encoding.

Closes SURVEY.md §2.8 C10's CFF half (reference pdffont.py:174-217
``getdict``, :220-723 ``CFFFont``).  Note the reference never instantiates
``CFFFont`` on any extraction path — this module exists for capability
parity and is differential-tested against the reference class on the
embedded Type1C (FontFile3) streams in the sample corpus.

Spec-correctness deltas vs the reference (all superset, none reachable
through extraction there):

* two-byte ``12 x`` DICT operators are decoded as escaped keys (keyed
  ``1200 + x``) instead of being misread as operator 12 plus a stray
  following token — required for CIDFont CFFs whose top dict carries
  ``ROS`` (12 30), where the reference's reader desynchronizes;
* an empty INDEX is 2 bytes (count=0, no offSize) per spec §5;
* predefined charset 0 (ISOAdobe: sid == gid) and predefined encoding 0
  (Standard, resolved through the glyph-name table) are honored instead of
  seeking to file offset 0 and parsing header bytes as a table;
* charset format 2 (16-bit nLeft ranges) is implemented rather than
  asserting;
* charset/encoding tables follow the spec's role assignment (the listed
  values are SIDs/codes while gids run sequentially) — the reference's
  dead-code reader swaps those roles in format-1 charsets/encodings
  (pdffont.py:672-681, :701-711) and even in format-0 encodings
  (:666-671 reads the per-gid code array as per-code gids), so the
  differential corpus test compares maps only on format-0 charsets,
  where the reference is spec-correct, and sanity-checks the rest.

The 391 standard strings (Adobe CFF spec appendix A — public data) ship as
``resources/cff_standard_strings.json.gz`` like the repo's other tables.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import BinaryIO, Dict, List, Union

from pdfminer_six_spark.core.encodings import load_resource


class CFFError(Exception):
    """Structurally invalid CFF data."""


@lru_cache(maxsize=1)
def standard_strings() -> List[str]:
    return load_resource("cff_standard_strings")


def parse_dict(data: bytes) -> Dict[int, List[Union[int, float]]]:
    """CFF DICT: operands accumulate until an operator byte (0-21) claims
    them.  Escaped operators (12 x) are keyed as ``1200 + x``."""
    out: Dict[int, List[Union[int, float]]] = {}
    operands: List[Union[int, float]] = []
    i, n = 0, len(data)
    try:
        while i < n:
            b0 = data[i]
            if b0 <= 21:  # operator
                if b0 == 12:
                    i += 1
                    key = 1200 + data[i]
                else:
                    key = b0
                out[key] = operands
                operands = []
                i += 1
            elif b0 == 28:  # 16-bit signed
                operands.append(struct.unpack(">h", data[i + 1 : i + 3])[0])
                i += 3
            elif b0 == 29:  # 32-bit signed
                operands.append(struct.unpack(">i", data[i + 1 : i + 5])[0])
                i += 5
            elif b0 == 30:  # packed-nibble real
                i += 1
                txt = ""
                while True:
                    byte = data[i]
                    i += 1
                    stop = False
                    for nib in (byte >> 4, byte & 0xF):
                        if nib == 0xF:
                            stop = True
                            break
                        if nib == 0xC:  # 'E-'
                            txt += "e-"
                        elif nib == 0xB:
                            txt += "e"
                        elif nib == 0xA:
                            txt += "."
                        elif nib == 0xD:  # reserved
                            raise CFFError("reserved real nibble")
                        elif nib == 0xE:
                            txt += "-"
                        else:
                            txt += chr(0x30 + nib)
                    if stop:
                        break
                operands.append(float(txt))
            elif 32 <= b0 <= 246:
                operands.append(b0 - 139)
                i += 1
            elif 247 <= b0 <= 250:
                operands.append((b0 - 247) * 256 + data[i + 1] + 108)
                i += 2
            elif 251 <= b0 <= 254:
                operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
                i += 2
            else:
                raise CFFError(f"reserved DICT byte {b0}")
    except (IndexError, struct.error) as e:
        raise CFFError(f"truncated DICT: {e}") from e
    return out


def _read_exact(fp: BinaryIO, n: int) -> bytes:
    data = fp.read(n)
    if len(data) < n:
        raise CFFError(f"truncated table: wanted {n} bytes, got {len(data)}")
    return data


def parse_index(fp: BinaryIO) -> List[bytes]:
    """Read one INDEX at the current position, leaving ``fp`` just past it.
    Materializes the entries (CFF tables are small — KBs, not the payload
    corpus) instead of keeping a live file handle per entry."""
    head = fp.read(2)
    if len(head) < 2:
        raise CFFError("truncated INDEX count")
    (count,) = struct.unpack(">H", head)
    if count == 0:
        return []  # spec §5: empty INDEX has no offSize/offsets
    offsize = _read_exact(fp, 1)[0]
    if not 1 <= offsize <= 4:
        raise CFFError(f"bad INDEX offSize {offsize}")
    raw = fp.read((count + 1) * offsize)
    if len(raw) < (count + 1) * offsize:
        raise CFFError("truncated INDEX offsets")
    offsets = [
        int.from_bytes(raw[k * offsize : (k + 1) * offsize], "big")
        for k in range(count + 1)
    ]
    if offsets[0] != 1 or any(a > b for a, b in zip(offsets, offsets[1:])):
        raise CFFError("non-monotonic INDEX offsets")
    blob = fp.read(offsets[-1] - 1)
    if len(blob) < offsets[-1] - 1:
        raise CFFError("truncated INDEX data")
    return [blob[a - 1 : b - 1] for a, b in zip(offsets, offsets[1:])]


# top-dict operator keys (spec §9 table 9)
OP_CHARSET = 15
OP_ENCODING = 16
OP_CHARSTRINGS = 17
OP_ROS = 1230  # 12 30: CIDFont marker


class CFFFont:
    """Queryable CFF surface: ``name``, ``top_dict``, ``nglyphs``,
    ``code2gid``/``gid2code``, ``name2gid``/``gid2name``, ``getstr`` —
    the same attributes the reference class exposes (pdffont.py:638-716).
    """

    def __init__(self, name: str, fp: BinaryIO) -> None:
        self.name = name
        self.fp = fp
        try:
            header = fp.read(4)
            major, _minor, hdrsize, _offsize = struct.unpack("BBBB", header)
        except struct.error as e:
            raise CFFError("truncated header") from e
        if major != 1:
            raise CFFError(f"unsupported CFF major version {major}")
        fp.read(max(hdrsize - 4, 0))
        self.name_index = parse_index(fp)
        dict_index = parse_index(fp)
        self.string_index = parse_index(fp)
        self.gsubr_index = parse_index(fp)
        if not dict_index:
            raise CFFError("missing Top DICT")
        self.top_dict = parse_dict(dict_index[0])
        self.is_cid = OP_ROS in self.top_dict
        (charstring_pos,) = self.top_dict.get(OP_CHARSTRINGS, [0])
        if not charstring_pos:
            raise CFFError("missing CharStrings offset")
        fp.seek(int(charstring_pos))
        self.charstrings = parse_index(fp)
        self.nglyphs = len(self.charstrings)
        self._read_charset(int(self.top_dict.get(OP_CHARSET, [0])[0]))
        self._read_encoding(int(self.top_dict.get(OP_ENCODING, [0])[0]))

    # -- charset: gid <-> sid/name ------------------------------------

    def _read_charset(self, pos: int) -> None:
        self.gid2sid: Dict[int, int] = {0: 0}
        if pos in (0, 1, 2):
            # predefined (0=ISOAdobe, 1=Expert, 2=ExpertSubset); ISOAdobe
            # is the identity map over the standard strings — sufficient
            # for the non-CID fonts that omit the charset entry
            for gid in range(1, self.nglyphs):
                self.gid2sid[gid] = gid
        else:
            fp = self.fp
            fp.seek(pos)
            fmt = _read_exact(fp, 1)[0]
            if fmt == 0:
                raw = _read_exact(fp, 2 * (self.nglyphs - 1))
                for k, (sid,) in enumerate(
                    struct.iter_unpack(">H", raw), start=1
                ):
                    self.gid2sid[k] = sid
            elif fmt in (1, 2):
                gid = 1
                while gid < self.nglyphs:
                    if fmt == 1:
                        first, nleft = struct.unpack(">HB", _read_exact(fp, 3))
                    else:
                        first, nleft = struct.unpack(">HH", _read_exact(fp, 4))
                    for k in range(nleft + 1):
                        if gid >= self.nglyphs:
                            break
                        self.gid2sid[gid] = first + k
                        gid += 1
            else:
                raise CFFError(f"unsupported charset format {fmt}")
        self.gid2name: Dict[int, Union[str, bytes]] = {}
        self.name2gid: Dict[Union[str, bytes], int] = {}
        if not self.is_cid:  # CID charsets map gid->CID, not glyph names
            for gid, sid in self.gid2sid.items():
                if gid == 0:
                    continue  # .notdef isn't addressable by name (same
                    # surface as the reference maps, pdffont.py:691-700)
                sname = self.getstr(sid)
                self.gid2name[gid] = sname
                self.name2gid[sname] = gid

    # -- encoding: code <-> gid ----------------------------------------

    def _read_encoding(self, pos: int) -> None:
        self.code2gid: Dict[int, int] = {}
        self.gid2code: Dict[int, int] = {}
        if self.is_cid:
            return  # CIDFonts have no encoding table
        if pos in (0, 1):
            # predefined: 0=Standard, 1=Expert.  Resolve Standard through
            # the shared glyph-name table (CFF spec appendix C is the
            # StandardEncoding map); Expert glyph names aren't in the latin
            # tables, so Expert stays empty (documented capability bound)
            if pos == 0:
                from pdfminer_six_spark.core.encodings import _latin_tables

                std = _latin_tables()["StandardEncoding"]
                for code, gname in std.items():
                    gid = self.name2gid.get(gname)
                    if gid is not None:
                        self.code2gid[code] = gid
                        self.gid2code.setdefault(gid, code)
            return
        fp = self.fp
        fp.seek(pos)
        fmt = _read_exact(fp, 1)[0]
        supplemented = bool(fmt & 0x80)
        fmt &= 0x7F
        if fmt == 0:
            n = _read_exact(fp, 1)[0]
            for code_idx, code in enumerate(_read_exact(fp, n), start=1):
                self.code2gid[code] = code_idx
                self.gid2code.setdefault(code_idx, code)
        elif fmt == 1:
            n = _read_exact(fp, 1)[0]
            gid = 1
            for _ in range(n):
                first, nleft = struct.unpack("BB", _read_exact(fp, 2))
                for code in range(first, first + nleft + 1):
                    self.code2gid[code] = gid
                    self.gid2code.setdefault(gid, code)
                    gid += 1
        else:
            raise CFFError(f"unsupported encoding format {fmt}")
        if supplemented:
            (nsups,) = struct.unpack("B", _read_exact(fp, 1))
            for _ in range(nsups):
                code, sid = struct.unpack(">BH", _read_exact(fp, 3))
                gid = self.name2gid.get(self.getstr(sid))
                if gid is not None:
                    self.code2gid[code] = gid

    def getstr(self, sid: int) -> Union[str, bytes]:
        """SID -> string.  Mirrors the reference contract exactly
        (pdffont.py:718-723): str for a standard string, raw bytes for a
        font-defined one."""
        std = standard_strings()
        if sid < len(std):
            return std[sid]
        try:
            return self.string_index[sid - len(std)]
        except IndexError:
            raise CFFError(f"SID {sid} out of range") from None
