#!/usr/bin/env python3
"""Extract pdf structure in XML format.

CLI + output parity with the reference's tools/dumppdf.py (reference
tools/dumppdf.py:37-101 for the XML shapes, :104-147 trailers/all-objects,
:150-204 outlines, :211-248 embedded-file extraction).  Output is
byte-compared against the reference in tests/test_tools_cli.py, including
its quirks:

  * ``-r`` / ``-b`` write stream bytes to a text file handle and therefore
    raise TypeError (the reference's known bug, tools/dumppdf.py:64-69 —
    its own test suite asserts the crash, so we keep the behavior);
  * keywords/literals holding bytes names render as ``b'...'``
    (tools/dumppdf.py:86-95);
  * fallback xrefs are hidden unless --show-fallback-xref, with a warning
    when that hides everything (tools/dumppdf.py:104-122).
"""

from __future__ import annotations

import os
import re
import sys
from argparse import ArgumentParser
from typing import Any, Container, Iterable, TextIO

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfminer_six_spark.core.document import (  # noqa: E402
    Document,
    ObjectNotFound,
    XRefFallback,
    iter_pages,
)
from pdfminer_six_spark.core.navigation import (  # noqa: E402
    NoOutlines,
    get_outlines,
    resolve_dest as _resolve_named_dest,
)
from pdfminer_six_spark.core.objects import (  # noqa: E402
    Keyword,
    Name,
    ObjRef,
    StreamObject,
    resolve1,
)

ESC_PAT = re.compile(r'[\000-\037&<>()"\042\047\134\177-\377]')


def escape(s) -> str:
    us = str(s, "latin-1") if isinstance(s, bytes) else s
    return ESC_PAT.sub(lambda m: f"&#{ord(m.group(0))};", us)


def dumpxml(out: TextIO, obj: object, codec: str | None = None) -> None:
    if obj is None:
        out.write("<null />")
        return
    if isinstance(obj, dict):
        out.write(f'<dict size="{len(obj)}">\n')
        for k, v in obj.items():
            out.write(f"<key>{k}</key>\n")
            out.write("<value>")
            dumpxml(out, v)
            out.write("</value>\n")
        out.write("</dict>")
        return
    if isinstance(obj, list):
        out.write(f'<list size="{len(obj)}">\n')
        for v in obj:
            dumpxml(out, v)
            out.write("\n")
        out.write("</list>")
        return
    if isinstance(obj, (str, bytes)):
        out.write(f'<string size="{len(obj)}">{escape(obj)}</string>')
        return
    if isinstance(obj, StreamObject):
        if codec == "raw":
            # reference bug kept for parity: bytes into a text handle
            out.write(obj.get_rawdata())  # type: ignore[arg-type]
        elif codec == "binary":
            out.write(obj.get_data())  # type: ignore[arg-type]
        else:
            out.write("<stream>\n<props>\n")
            dumpxml(out, obj.attrs)
            out.write("\n</props>\n")
            if codec == "text":
                data = obj.get_data()
                out.write(f'<data size="{len(data)}">{escape(data)}</data>\n')
            out.write("</stream>")
        return
    if isinstance(obj, ObjRef):
        out.write(f'<ref id="{obj.objid}" />')
        return
    if isinstance(obj, Keyword):
        out.write(f"<keyword>{obj.name}</keyword>")
        return
    if isinstance(obj, Name):
        out.write(f"<literal>{obj.name}</literal>")
        return
    if isinstance(obj, (int, float)):
        out.write(f"<number>{obj}</number>")
        return
    raise TypeError(obj)


def dumptrailers(out: TextIO, doc: Document, show_fallback_xref: bool = False) -> None:
    for xref in doc.xrefs:
        if not isinstance(xref, XRefFallback) or show_fallback_xref:
            out.write("<trailer>\n")
            dumpxml(out, xref.get_trailer())
            out.write("\n</trailer>\n\n")
    no_xrefs = all(isinstance(xref, XRefFallback) for xref in doc.xrefs)
    if no_xrefs and not show_fallback_xref:
        sys.stderr.write(
            "WARNING: This PDF does not have an xref. Use --show-fallback-xref "
            "if you want to display the content of a fallback xref that "
            "contains all objects.\n",
        )


def dumpallobjs(
    out: TextIO,
    doc: Document,
    codec: str | None = None,
    show_fallback_xref: bool = False,
) -> None:
    visited = set()
    out.write("<pdf>")
    for xref in doc.xrefs:
        for objid in xref.get_objids():
            if objid in visited:
                continue
            visited.add(objid)
            try:
                obj = doc.getobj(objid)
                if obj is None:
                    continue
                out.write(f'<object id="{objid}">\n')
                dumpxml(out, obj, codec=codec)
                out.write("\n</object>\n\n")
            except ObjectNotFound as e:
                # the reference prints its exception repr (PDFObjectNotFound)
                print(f"not found: PDFObjectNotFound({e.args[0] if e.args else ''!r})")
    dumptrailers(out, doc, show_fallback_xref)
    out.write("</pdf>")


def dumpoutline(
    outfp: TextIO,
    fname: str,
    objids: Any,
    pagenos: Container[int],
    password: str = "",
    dumpall: bool = False,
    codec: str | None = None,
    extractdir: str | None = None,
) -> None:
    with open(fname, "rb") as fp:
        doc = Document(fp.read(), password=password)
    pages = {
        page.pageid: pageno for (pageno, page) in enumerate(iter_pages(doc), 1)
    }

    def resolve_dest(dest: object) -> Any:
        if isinstance(dest, (str, bytes)):
            dest = resolve1(_resolve_named_dest(doc, dest))
        elif isinstance(dest, Name):
            dest = resolve1(_resolve_named_dest(doc, dest.name))
        if isinstance(dest, dict):
            dest = dest["D"]
        if isinstance(dest, ObjRef):
            dest = dest.resolve()
        return dest

    try:
        outlines = get_outlines(doc)
        outfp.write("<outlines>\n")
        for level, title, dest, a, _se in outlines:
            pageno = None
            if dest:
                dest = resolve_dest(dest)
                pageno = pages[dest[0].objid]
            elif a:
                action = a
                if isinstance(action, dict):
                    subtype = action.get("S")
                    if subtype and repr(subtype) == "/'GoTo'" and action.get("D"):
                        dest = resolve_dest(action["D"])
                        pageno = pages[dest[0].objid]
            s = escape(title)
            outfp.write(f'<outline level="{level!r}" title="{s}">\n')
            if dest is not None:
                outfp.write("<dest>")
                dumpxml(outfp, dest)
                outfp.write("</dest>\n")
            if pageno is not None:
                outfp.write(f"<pageno>{pageno!r}</pageno>\n")
            outfp.write("</outline>\n")
        outfp.write("</outlines>\n")
    except NoOutlines:
        pass


LITERAL_FILESPEC = Name.intern("Filespec")
LITERAL_EMBEDDEDFILE = Name.intern("EmbeddedFile")


def extractembedded(fname: str, password: str, extractdir: str) -> None:
    def extract1(objid: int, obj: dict) -> None:
        filename = os.path.basename(obj.get("UF") or obj.get("F").decode())
        fileref = obj["EF"].get("UF") or obj["EF"].get("F")
        fileobj = doc.getobj(fileref.objid)
        if not isinstance(fileobj, StreamObject):
            raise ValueError(
                f"unable to process PDF: reference for {filename!r} "
                "is not a PDFStream",
            )
        if fileobj.get("Type") is not LITERAL_EMBEDDEDFILE:
            raise ValueError(
                f"unable to process PDF: reference for {filename!r} "
                "is not an EmbeddedFile",
            )
        path = os.path.join(extractdir, f"{objid:06d}-{filename}")
        if os.path.exists(path):
            raise OSError(f"file exists: {path!r}")
        print(f"extracting: {path!r}")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as out:
            out.write(fileobj.get_data())

    with open(fname, "rb") as fp:
        doc = Document(fp.read(), password=password)
    extracted_objids = set()
    for xref in doc.xrefs:
        for objid in xref.get_objids():
            obj = doc.getobj(objid)
            if (
                objid not in extracted_objids
                and isinstance(obj, dict)
                and obj.get("Type") is LITERAL_FILESPEC
            ):
                extracted_objids.add(objid)
                extract1(objid, obj)


def dumppdf(
    outfp: TextIO,
    fname: str,
    objids: Iterable[int],
    pagenos: Container[int],
    password: str = "",
    dumpall: bool = False,
    codec: str | None = None,
    extractdir: str | None = None,
    show_fallback_xref: bool = False,
) -> None:
    with open(fname, "rb") as fp:
        doc = Document(fp.read(), password=password)
    if objids:
        for objid in objids:
            obj = doc.getobj(objid)
            dumpxml(outfp, obj, codec=codec)
    if pagenos:
        for pageno, page in enumerate(iter_pages(doc)):
            if pageno in pagenos:
                if codec:
                    for obj in page.contents:
                        obj = resolve1(obj)
                        dumpxml(outfp, obj, codec=codec)
                else:
                    dumpxml(outfp, page.attrs)
    if dumpall:
        dumpallobjs(outfp, doc, codec, show_fallback_xref)
    if (not objids) and (not pagenos) and (not dumpall):
        dumptrailers(outfp, doc, show_fallback_xref)
    if codec not in ("raw", "binary"):
        outfp.write("\n")


def create_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__, add_help=True)
    parser.add_argument("files", type=str, default=None, nargs="+",
                        help="One or more paths to PDF files.")
    parser.add_argument("--debug", "-d", default=False, action="store_true")
    procedure_parser = parser.add_mutually_exclusive_group()
    procedure_parser.add_argument("--extract-toc", "-T", default=False,
                                  action="store_true",
                                  help="Extract structure of outline")
    procedure_parser.add_argument("--extract-embedded", "-E", type=str,
                                  help="Extract embedded files")
    parser.add_argument("--page-numbers", type=int, default=None, nargs="+",
                        help="A space-separated list of page numbers to parse.")
    parser.add_argument("--pagenos", "-p", type=str,
                        help="A comma-separated list of page numbers to parse.")
    parser.add_argument("--objects", "-i", type=str,
                        help="Comma separated list of object numbers to extract")
    parser.add_argument("--all", "-a", default=False, action="store_true",
                        help="If the structure of all objects should be extracted")
    parser.add_argument("--show-fallback-xref", action="store_true")
    parser.add_argument("--password", "-P", type=str, default="")
    parser.add_argument("--outfile", "-o", type=str, default="-")
    codec_parser = parser.add_mutually_exclusive_group()
    codec_parser.add_argument("--raw-stream", "-r", default=False,
                              action="store_true")
    codec_parser.add_argument("--binary-stream", "-b", default=False,
                              action="store_true")
    codec_parser.add_argument("--text-stream", "-t", default=False,
                              action="store_true")
    return parser


def main(argv: list[str] | None = None) -> None:
    parser = create_parser()
    args = parser.parse_args(args=argv)

    objids = [int(x) for x in args.objects.split(",")] if args.objects else []
    if args.page_numbers:
        pagenos = {x - 1 for x in args.page_numbers}
    elif args.pagenos:
        pagenos = {int(x) - 1 for x in args.pagenos.split(",")}
    else:
        pagenos = set()

    if args.raw_stream:
        codec: str | None = "raw"
    elif args.binary_stream:
        codec = "binary"
    elif args.text_stream:
        codec = "text"
    else:
        codec = None

    with sys.stdout if args.outfile == "-" else open(args.outfile, "w") as outfp:
        for fname in args.files:
            if args.extract_toc:
                dumpoutline(
                    outfp, fname, objids, pagenos, password=args.password,
                    dumpall=args.all, codec=codec, extractdir=None,
                )
            elif args.extract_embedded:
                extractembedded(
                    fname, password=args.password, extractdir=args.extract_embedded
                )
            else:
                dumppdf(
                    outfp, fname, objids, pagenos, password=args.password,
                    dumpall=args.all, codec=codec, extractdir=None,
                    show_fallback_xref=args.show_fallback_xref,
                )


if __name__ == "__main__":
    main()
