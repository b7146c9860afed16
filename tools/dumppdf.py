#!/usr/bin/env python3
"""CLI parity with the reference's tools/dumppdf.py (reference
tools/dumppdf.py:250-282): dump the raw object graph / trailer / outlines —
the debugging "EXPLAIN" of the extraction engine.

    python tools/dumppdf.py [-a | -i OBJID] [-T] [--trailer] file.pdf
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfminer_six_spark.core.document import Document  # noqa: E402
from pdfminer_six_spark.core.navigation import NoOutlines, get_outlines  # noqa: E402
from pdfminer_six_spark.core.objects import (  # noqa: E402
    Name,
    ObjRef,
    StreamObject,
)


def dump(obj, depth: int = 0) -> str:
    pad = "  " * depth
    if isinstance(obj, dict):
        inner = "".join(
            f"{pad}  /{k} {dump(v, depth + 1).lstrip()}\n" for k, v in obj.items()
        )
        return f"{pad}<<\n{inner}{pad}>>"
    if isinstance(obj, list):
        inner = " ".join(dump(v, 0) for v in obj)
        return f"{pad}[ {inner} ]"
    if isinstance(obj, StreamObject):
        return f"{pad}<stream attrs={dump(obj.attrs, depth)} len_raw={len(obj.rawdata or b'')}>"
    if isinstance(obj, ObjRef):
        return f"{pad}{obj.objid} 0 R"
    if isinstance(obj, Name):
        return f"{pad}/{obj.name}"
    if isinstance(obj, bytes):
        return f"{pad}{obj[:64]!r}"
    return f"{pad}{obj!r}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("-a", "--all", action="store_true", help="dump all objects")
    ap.add_argument("-i", "--objid", type=int, default=None)
    ap.add_argument("-T", "--outlines", action="store_true")
    ap.add_argument("--trailer", action="store_true")
    args = ap.parse_args()

    for path in args.files:
        with open(path, "rb") as f:
            doc = Document(f.read())
        if args.trailer or not (args.all or args.objid or args.outlines):
            for i, xref in enumerate(doc.xrefs):
                print(f"== trailer {i} ==")
                print(dump(xref.get_trailer()))
        if args.objid is not None:
            print(dump(doc.getobj(args.objid)))
        if args.all:
            seen = set()
            for xref in doc.xrefs:
                for objid in xref.get_objids():
                    if objid in seen:
                        continue
                    seen.add(objid)
                    try:
                        print(f"== obj {objid} ==")
                        print(dump(doc.getobj(objid)))
                    except Exception as e:
                        print(f"  <error {type(e).__name__}: {e}>")
        if args.outlines:
            try:
                for level, title, dest, action, se in get_outlines(doc):
                    print(f"{'  ' * level}{title!r}")
            except NoOutlines:
                print("(no outlines)")


if __name__ == "__main__":
    main()
