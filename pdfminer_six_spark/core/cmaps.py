"""CMap support: byte->CID decoding and CID->Unicode maps (SURVEY.md §2.8).

Predefined Adobe CMaps load from our re-serialized public resources
(``resources/cmap-*.json.gz`` / ``u2-*.json.gz``); embedded ToUnicode CMaps
are parsed with the engine's own tokenizer.  Decode/lookup semantics per the
reference (pdfminer.six cmapdb.py:67-199 trie decode & unicode maps,
:345-496 CMap file parser).

Caches are per-executor-process (class-level) so a Spark python worker
parses each predefined CMap at most once across all Arrow batches.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Iterable, Iterator, List

from pdfminer_six_spark.core.encodings import GlyphNameError, glyph2unicode, load_resource
from pdfminer_six_spark.core.objects import (
    KWD,
    LexEOF,
    Name,
    ParseError,
    name_str,
    nunpack,
)
from pdfminer_six_spark.core.parser import StackParser


class CMapNotFound(KeyError):
    pass


class BaseCMap:
    def __init__(self, **attrs: Any) -> None:
        self.attrs: Dict[str, Any] = dict(attrs)

    def is_vertical(self) -> bool:
        return self.attrs.get("WMode", 0) != 0

    def set_attr(self, k: str, v: Any) -> None:
        self.attrs[k] = v

    def use_cmap(self, other: "BaseCMap") -> None:
        pass

    def add_cid2unichr(self, cid: int, code: Any) -> None:
        pass

    def decode(self, code: bytes) -> Iterable[int]:
        raise NotImplementedError


class CMap(BaseCMap):
    """code->CID via a nested byte trie."""

    def __init__(self, **attrs: Any) -> None:
        super().__init__(**attrs)
        self.code2cid: Dict[int, Any] = {}

    def use_cmap(self, other: BaseCMap) -> None:
        if not isinstance(other, CMap):
            return

        def copy(dst: Dict[int, Any], src: Dict[int, Any]) -> None:
            for k, v in src.items():
                if isinstance(v, dict):
                    d: Dict[int, Any] = {}
                    dst[k] = d
                    copy(d, v)
                else:
                    dst[k] = v

        copy(self.code2cid, other.code2cid)

    def decode(self, code: bytes) -> Iterator[int]:
        d = self.code2cid
        root = self.code2cid
        for b in code:
            nxt = d.get(b)
            if nxt is None:
                d = root
            elif isinstance(nxt, int):
                yield nxt
                d = root
            else:
                d = nxt


class IdentityCMap(BaseCMap):
    """2-byte big-endian identity."""

    def decode(self, code: bytes) -> Iterable[int]:
        n = len(code) // 2
        return struct.unpack(f">{n}H", code[: n * 2]) if n else ()


class IdentityCMapByte(BaseCMap):
    """1-byte identity."""

    def decode(self, code: bytes) -> Iterable[int]:
        return bytearray(code)


class UnicodeMap(BaseCMap):
    def __init__(self, **attrs: Any) -> None:
        super().__init__(**attrs)
        self.cid2unichr: Dict[int, str] = {}

    def get_unichr(self, cid: int) -> str:
        return self.cid2unichr[cid]


class IdentityUnicodeMap(UnicodeMap):
    def get_unichr(self, cid: int) -> str:
        return chr(cid)


class FileUnicodeMap(UnicodeMap):
    """ToUnicode map built from an embedded CMap stream."""

    def add_cid2unichr(self, cid: int, code: Any) -> None:
        if isinstance(code, Name):
            try:
                unichr = glyph2unicode(str(code.name))
            except GlyphNameError:
                return
        elif isinstance(code, bytes):
            unichr = code.decode("UTF-16BE", "ignore")
        elif isinstance(code, int):
            unichr = chr(code)
        else:
            return
        # NBSP/space collision rule (reference cmapdb.py:197-198)
        if unichr == " " and self.cid2unichr.get(cid) == " ":
            return
        self.cid2unichr[cid] = unichr


# ---------------------------------------------------------------------------
# predefined CMap database backed by resources/


def _intkeys(tree: Dict[str, Any]) -> Dict[int, Any]:
    out: Dict[int, Any] = {}
    for k, v in tree.items():
        out[int(k)] = _intkeys(v) if isinstance(v, dict) else v
    return out


class CMapDB:
    _cmap_cache: Dict[str, CMap] = {}
    _umap_cache: Dict[str, List[UnicodeMap]] = {}

    @classmethod
    def get_cmap(cls, name: str) -> BaseCMap:
        if name == "Identity-H":
            return IdentityCMap(WMode=0)
        if name == "Identity-V":
            return IdentityCMap(WMode=1)
        if name == "OneByteIdentityH":
            return IdentityCMapByte(WMode=0)
        if name == "OneByteIdentityV":
            return IdentityCMapByte(WMode=1)
        name = name.replace("\0", "")
        if name in cls._cmap_cache:
            return cls._cmap_cache[name]
        try:
            payload = load_resource("cmap-" + name)
        except (OSError, ValueError):
            raise CMapNotFound(name)
        cmap = CMap(CMapName=name)
        attrs = payload.get("attrs", {})
        if attrs.get("WMode") in ("1", 1):
            cmap.attrs["WMode"] = 1
        cmap.code2cid = _intkeys(payload["code2cid"])
        cls._cmap_cache[name] = cmap
        return cmap

    @classmethod
    def get_unicode_map(cls, name: str, vertical: bool = False) -> UnicodeMap:
        name = name.replace("\0", "")
        if name not in cls._umap_cache:
            try:
                payload = load_resource("u2-" + name)
            except (OSError, ValueError):
                raise CMapNotFound(name)
            maps = []
            for key in ("H", "V"):
                um = UnicodeMap(CMapName=name, WMode=1 if key == "V" else 0)
                um.cid2unichr = {int(k): v for k, v in payload[key].items()}
                maps.append(um)
            cls._umap_cache[name] = maps
        return cls._umap_cache[name][1 if vertical else 0]


# ---------------------------------------------------------------------------
# embedded-CMap parser (ToUnicode streams; reference cmapdb.py:345-496)

_KW = {
    n: KWD(n.encode())
    for n in (
        "begincmap", "endcmap", "usecmap", "def",
        "begincodespacerange", "endcodespacerange",
        "begincidrange", "endcidrange",
        "begincidchar", "endcidchar",
        "beginbfrange", "endbfrange",
        "beginbfchar", "endbfchar",
        "beginnotdefrange", "endnotdefrange",
    )
}


class CMapStreamParser(StackParser):
    def __init__(self, sink: BaseCMap, data: bytes) -> None:
        super().__init__(data)
        self.sink = sink
        self._in_cmap = False

    def run(self) -> None:
        try:
            while True:
                self.nextobject()
        except LexEOF:
            pass

    def flush(self) -> None:
        pass

    def do_keyword(self, pos: int, token) -> None:
        s = self.sink
        if token is _KW["begincmap"]:
            self._in_cmap = True
            self.popall()
            return
        if token is _KW["endcmap"]:
            self._in_cmap = False
            return
        if not self._in_cmap:
            return
        if token is _KW["def"]:
            try:
                ((_, k), (_, v)) = self.pop(2)
                s.set_attr(name_str(k), v)
            except (ValueError, ParseError):
                pass
            return
        if token is _KW["usecmap"]:
            try:
                ((_, cmapname),) = self.pop(1)
                s.use_cmap(CMapDB.get_cmap(name_str(cmapname)))
            except (ValueError, ParseError, CMapNotFound):
                pass
            return
        if token in (
            _KW["begincodespacerange"], _KW["endcodespacerange"],
            _KW["begincidrange"], _KW["begincidchar"],
            _KW["beginbfrange"], _KW["beginbfchar"],
            _KW["beginnotdefrange"], _KW["endnotdefrange"],
        ):
            self.popall()
            return
        if token is _KW["endcidrange"]:
            objs = [v for (_, v) in self.popall()]
            for start, end, cid in _chop3(objs):
                if not (
                    isinstance(start, bytes)
                    and isinstance(end, bytes)
                    and isinstance(cid, int)
                    and len(start) == len(end)
                    and start[:-4] == end[:-4]
                ):
                    continue
                prefix = start[:-4]
                svar, evar = start[-4:], end[-4:]
                s0, e0 = nunpack(svar), nunpack(evar)
                vlen = len(svar)
                for i in range(e0 - s0 + 1):
                    x = prefix + struct.pack(">L", s0 + i)[-vlen:]
                    s.add_cid2unichr(cid + i, x)
            return
        if token is _KW["endcidchar"]:
            objs = [v for (_, v) in self.popall()]
            for cid, code in _chop2(objs):
                if isinstance(code, bytes) and isinstance(cid, int):
                    s.add_cid2unichr(cid, code)
            return
        if token is _KW["endbfrange"]:
            objs = [v for (_, v) in self.popall()]
            for start, end, code in _chop3(objs):
                if not (
                    isinstance(start, bytes)
                    and isinstance(end, bytes)
                    and len(start) == len(end)
                ):
                    continue
                s0, e0 = nunpack(start), nunpack(end)
                if isinstance(code, list):
                    for cid, v in zip(range(s0, e0 + 1), code):
                        s.add_cid2unichr(cid, v)
                elif isinstance(code, bytes):
                    var = code[-4:]
                    base = nunpack(var)
                    prefix = code[:-4]
                    vlen = len(var)
                    for i in range(e0 - s0 + 1):
                        x = prefix + struct.pack(">L", base + i)[-vlen:]
                        s.add_cid2unichr(s0 + i, x)
            return
        if token is _KW["endbfchar"]:
            objs = [v for (_, v) in self.popall()]
            for cid, code in _chop2(objs):
                if isinstance(cid, bytes) and isinstance(code, bytes):
                    s.add_cid2unichr(nunpack(cid), code)
            return
        self.push((pos, token))


def _chop2(seq):
    it = iter(seq)
    return zip(it, it)


def _chop3(seq):
    it = iter(seq)
    return zip(it, it, it)


_TOUNICODE_CACHE: Dict[bytes, FileUnicodeMap] = {}


def parse_tounicode(data: bytes) -> FileUnicodeMap:
    """Parse a ToUnicode CMap stream.  Cached by content digest: the maps
    are immutable pure data, and identical font programs recur constantly
    across documents in a corpus (per-executor cache, like the reference's
    CMapDB class caches but content-addressed so it is document-safe)."""
    import hashlib

    key = hashlib.sha1(data).digest()
    cached = _TOUNICODE_CACHE.get(key)
    if cached is not None:
        return cached
    umap = FileUnicodeMap()
    CMapStreamParser(umap, data).run()
    if len(_TOUNICODE_CACHE) < 4096:
        _TOUNICODE_CACHE[key] = umap
    return umap
