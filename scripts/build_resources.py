#!/usr/bin/env python3
"""Build static data resources for pdfminer_six_spark.

All of these are PUBLIC Adobe-published data sets (not code):

* the Adobe Glyph List (AGL) — glyph name -> unicode,
* the four Latin text encodings from the PDF spec (Annex D of ISO 32000):
  StandardEncoding, MacRomanEncoding, WinAnsiEncoding, PDFDocEncoding,
* the Adobe Core-14 AFM font metrics (per-glyph widths),
* the Adobe CID-keyed CMap tables (code->CID) and CID->Unicode tables for
  the CJK character collections (Adobe-Japan1, Adobe-GB1, Adobe-CNS1,
  Adobe-Korea1, Adobe-KR, Adobe-Identity).

We extract the *values* of these public tables by importing the reference
implementation in-place (it ships them pre-parsed), then re-serialize into
our own compact gzipped-JSON format under pdfminer_six_spark/resources/.
No reference source code is copied; only public standards data flows through.

Run once:  python scripts/build_resources.py
"""

import gzip
import json
import os
import sys

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(__file__), "..", "pdfminer_six_spark", "resources")


def dump(name: str, obj) -> None:
    path = os.path.join(OUT, name + ".json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(obj, f, separators=(",", ":"), ensure_ascii=False)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def build_agl() -> None:
    # Adobe Glyph List: glyph name -> unicode string.
    from pdfminer.glyphlist import glyphname2unicode

    dump("agl", glyphname2unicode)


def build_encodings() -> None:
    # PDF Annex D Latin encodings, stored as {encoding: {code(str): glyphname}}.
    from pdfminer.latin_enc import ENCODING

    tables = {"S": {}, "M": {}, "W": {}, "P": {}}
    for name, std, mac, win, pdf in ENCODING:
        for key, code in zip("SMWP", (std, mac, win, pdf)):
            if code is not None:
                tables[key][str(code)] = name
    dump(
        "latin_encodings",
        {
            "StandardEncoding": tables["S"],
            "MacRomanEncoding": tables["M"],
            "WinAnsiEncoding": tables["W"],
            "PDFDocEncoding": tables["P"],
        },
    )


def build_afm() -> None:
    # Adobe Core-14 AFM metrics: fontname -> (descriptor, {glyphname: width}).
    from pdfminer.fontmetrics import FONT_METRICS

    out = {}
    for fontname, (desc, widths) in FONT_METRICS.items():
        out[fontname] = {"descriptor": desc, "widths": widths}
    dump("afm_core14", out)


def _dump_code2cid(tree) -> dict:
    # The reference stores code->CID maps as nested dicts keyed by int byte,
    # leaf values are CIDs. Re-key to strings for JSON.
    out = {}
    for k, v in tree.items():
        out[str(k)] = _dump_code2cid(v) if isinstance(v, dict) else v
    return out


def build_cmaps() -> None:
    """Dump every predefined Adobe CMap (code->CID) and the CID->Unicode
    tables.  These derive from Adobe's public CMap/cid2code resources."""
    from pdfminer.cmapdb import CMapDB, CMap, IdentityCMap, IdentityCMapByte

    cmap_dir = "/root/reference/pdfminer/cmap"
    names = sorted(
        fn[: -len(".json.gz")]
        for fn in os.listdir(cmap_dir)
        if fn.endswith(".json.gz")
    )
    index = {"cmaps": [], "unicode_maps": []}
    for name in names:
        if name.startswith("to-unicode-"):
            short = name[len("to-unicode-") :]
            h = CMapDB.get_unicode_map(short, vertical=False)
            v = CMapDB.get_unicode_map(short, vertical=True)
            dump(
                "u2-" + short,
                {
                    "H": {str(k): c for k, c in h.cid2unichr.items()},
                    "V": {str(k): c for k, c in v.cid2unichr.items()},
                },
            )
            index["unicode_maps"].append(short)
            continue
        cmap = CMapDB.get_cmap(name)
        if isinstance(cmap, (IdentityCMap, IdentityCMapByte)):
            continue
        payload = {
            "attrs": {k: str(v) for k, v in cmap.attrs.items()},
            "code2cid": _dump_code2cid(cmap.code2cid),
        }
        dump("cmap-" + name, payload)
        index["cmaps"].append(name)
    dump("cmap-index", index)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    build_agl()
    build_encodings()
    build_afm()
    build_cmaps()
