"""Glyph-name and Latin-encoding lookups (SURVEY.md §2.8 C4-C5).

Data comes from our re-serialized public Adobe tables
(``resources/agl.json.gz``, ``resources/latin_encodings.json.gz`` — see
scripts/build_resources.py).  Lookup semantics per the reference
(pdfminer.six encodingdb.py:16-127): AGL names, ``uniXXXX``/``uXXXXXX``
forms, ``_``-joined compounds, suffix stripping, surrogate rejection,
and /Differences overlays.

At Spark scale these dictionaries are loaded once per executor process
(module import time) and shared by every UDF batch — the moral equivalent
of a broadcast variable without the shuffle.
"""

from __future__ import annotations

import gzip
import json
import re
from functools import lru_cache
from typing import Dict, Iterable, Optional

from pdfminer_six_spark.core.objects import Name

_HEX = re.compile(r"[0-9a-fA-F]+")


def load_resource(name: str):
    """Load a resources/*.json.gz table through importlib.resources so it
    works identically from a checkout and from inside the spark-submit
    --py-files zip (executors import the package via zipimport — plain
    filesystem paths do not exist there)."""
    from importlib import resources

    ref = resources.files("pdfminer_six_spark").joinpath(
        "resources", name + ".json.gz"
    )
    with ref.open("rb") as raw, gzip.open(raw, "rt", encoding="utf-8") as f:
        return json.load(f)


@lru_cache(maxsize=1)
def _agl() -> Dict[str, str]:
    return load_resource("agl")


@lru_cache(maxsize=1)
def _latin_tables() -> Dict[str, Dict[int, str]]:
    raw = load_resource("latin_encodings")
    return {
        enc: {int(code): glyph for code, glyph in table.items()}
        for enc, table in raw.items()
    }


class GlyphNameError(KeyError):
    pass


def glyph2unicode(name: str) -> str:
    """Adobe glyph name -> unicode string; raises GlyphNameError if the
    name matches nothing (caller decides the fallback)."""
    if not isinstance(name, str):
        raise GlyphNameError(name)
    name = name.split(".")[0]
    parts = name.split("_")
    if len(parts) > 1:
        return "".join(glyph2unicode(p) for p in parts)
    agl = _agl()
    if name in agl:
        return agl[name]
    if name.startswith("uni"):
        digits = name.strip("uni")
        if _HEX.match(digits) and len(digits) % 4 == 0:
            cps = [int(digits[i : i + 4], 16) for i in range(0, len(digits), 4)]
            for cp in cps:
                _reject_surrogate(cp)
            return "".join(map(chr, cps))
    elif name.startswith("u"):
        digits = name.strip("u")
        if _HEX.match(digits) and 4 <= len(digits) <= 6:
            cp = int(digits, 16)
            _reject_surrogate(cp)
            return chr(cp)
    raise GlyphNameError(name)


def _reject_surrogate(cp: int) -> None:
    if 0xD7FF < cp < 0xE000:
        raise GlyphNameError(f"surrogate U+{cp:04X}")


@lru_cache(maxsize=8)
def _encoding_to_unicode(encoding_name: str) -> Dict[int, str]:
    tables = _latin_tables()
    table = tables.get(encoding_name, tables["StandardEncoding"])
    out: Dict[int, str] = {}
    for code, glyph in table.items():
        try:
            out[code] = glyph2unicode(glyph)
        except GlyphNameError:
            pass
    return out


def get_encoding(
    name: str, differences: Optional[Iterable[object]] = None
) -> Dict[int, str]:
    """code -> unicode for a named base encoding with optional /Differences
    overlay (reference encodingdb.py:106-127)."""
    cid2unicode = _encoding_to_unicode(name)
    if differences:
        cid2unicode = dict(cid2unicode)
        cid = 0
        for x in differences:
            if isinstance(x, int):
                cid = x
            elif isinstance(x, Name):
                try:
                    cid2unicode[cid] = glyph2unicode(str(x.name))
                except (GlyphNameError, ValueError):
                    pass
                cid += 1
    return cid2unicode
