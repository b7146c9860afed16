"""Document navigation structures (SURVEY.md §2.4 X8-X9):
outlines, name trees, number trees / page labels.

Semantics per the reference (pdfminer.six pdfdocument.py:874-950 outlines &
dests, :1021-1076 page labels; data_structures.py:11-54 NumberTree).
"""

from __future__ import annotations

import itertools
from typing import Any, Iterator, List, Optional, Tuple

from pdfminer_six_spark.core.document import Document
from pdfminer_six_spark.core.objects import (
    Name,
    ObjectNotFound,
    PDFError,
    dict_value,
    int_value,
    list_value,
    name_str,
    resolve1,
)


class NoOutlines(PDFError):
    pass


class NoPageLabels(PDFError):
    pass


def get_outlines(doc: Document) -> Iterator[Tuple[int, Any, Any, Any, Any]]:
    """(level, title, dest, action, se) tuples from the /Outlines tree."""
    if "Outlines" not in doc.catalog:
        raise NoOutlines("no /Outlines in catalog")

    def decode_title(raw) -> Any:
        raw = resolve1(raw)
        if isinstance(raw, bytes):
            if raw.startswith(b"\xfe\xff"):
                return raw[2:].decode("utf-16-be", "ignore")
            return raw.decode("latin1", "ignore")
        return raw

    def walk(entry, level: int, seen) -> Iterator:
        while entry is not None:
            eid = id(entry)
            ent = dict_value(entry)
            if not ent or eid in seen:
                return
            seen.add(eid)
            if "Title" in ent and ("A" in ent or "Dest" in ent):
                yield (
                    level,
                    decode_title(ent["Title"]),
                    ent.get("Dest"),
                    ent.get("A"),
                    ent.get("SE"),
                )
            if "First" in ent:
                yield from walk(ent["First"], level + 1, seen)
            entry = ent.get("Next")

    outlines = dict_value(doc.catalog["Outlines"])
    if "First" in outlines:
        return walk(outlines["First"], 1, set())
    return iter(())


class NumberTree:
    """PDF number tree (sorted int keys; /Nums leaves, /Kids internals)."""

    def __init__(self, obj: Any) -> None:
        self._obj = dict_value(obj)

    def _items(self, node: dict) -> Iterator[Tuple[int, Any]]:
        if "Nums" in node:
            nums = list_value(node["Nums"])
            it = iter(nums)
            for k, v in zip(it, it):
                k = resolve1(k)
                if isinstance(k, int):
                    yield (k, v)
        if "Kids" in node:
            for kid in list_value(node["Kids"]):
                yield from self._items(dict_value(kid))

    def items(self) -> List[Tuple[int, Any]]:
        return sorted(self._items(self._obj), key=lambda kv: kv[0])


_ROMAN_NUMS = (
    (1000, "m"), (900, "cm"), (500, "d"), (400, "cd"), (100, "c"),
    (90, "xc"), (50, "l"), (40, "xl"), (10, "x"), (9, "ix"),
    (5, "v"), (4, "iv"), (1, "i"),
)


def _roman(n: int) -> str:
    out = []
    for val, sym in _ROMAN_NUMS:
        while n >= val:
            out.append(sym)
            n -= val
    return "".join(out)


def _letters(n: int) -> str:
    # 1 -> a, 26 -> z, 27 -> aa ...
    q, r = divmod(n - 1, 26)
    return chr(ord("a") + r) * (q + 1)


def _format_label(style: Optional[str], n: int) -> str:
    if style == "D":
        return str(n)
    if style == "R":
        return _roman(n).upper()
    if style == "r":
        return _roman(n)
    if style == "A":
        return _letters(n).upper()
    if style == "a":
        return _letters(n)
    return ""


def get_page_labels(doc: Document) -> Iterator[str]:
    """Infinite iterator of page label strings per /PageLabels."""
    catalog = doc.catalog
    if "PageLabels" not in catalog:
        raise NoPageLabels("no /PageLabels")
    tree = NumberTree(resolve1(catalog["PageLabels"]))
    ranges = tree.items()
    if not ranges or ranges[0][0] != 0:
        raise NoPageLabels("malformed /PageLabels (first index != 0)")

    def labels_for(spec: dict) -> Iterator[str]:
        style_obj = spec.get("S")
        style = name_str(style_obj) if isinstance(style_obj, Name) else None
        prefix = resolve1(spec.get("P", b""))
        if isinstance(prefix, bytes):
            prefix = prefix.decode("latin1", "ignore")
        start = int_value(spec.get("St", 1)) or 1
        for n in itertools.count(start):
            yield f"{prefix}{_format_label(style, n)}"

    for i, (start_idx, spec) in enumerate(ranges):
        gen = labels_for(dict_value(resolve1(spec)))
        if i + 1 < len(ranges):
            count = ranges[i + 1][0] - start_idx
            for _ in range(count):
                yield next(gen)
        else:
            yield from gen


def resolve_dest(doc: Document, dest: Any) -> Any:
    """Resolve a named destination through /Names or /Dests."""
    dest = resolve1(dest)
    if isinstance(dest, (bytes, Name)):
        key = dest.name if isinstance(dest, Name) else dest
        names = dict_value(doc.catalog.get("Names", {}))
        if "Dests" in names:
            found = _nametree_lookup(dict_value(resolve1(names["Dests"])), key)
            if found is not None:
                return resolve1(found)
        dests = dict_value(doc.catalog.get("Dests", {}))
        skey = key.decode("latin1") if isinstance(key, bytes) else str(key)
        if skey in dests:
            return resolve1(dests[skey])
        raise ObjectNotFound(dest)
    return dest


def _nametree_lookup(node: dict, key) -> Any:
    if isinstance(key, str):
        key = key.encode("latin1", "ignore")
    if "Names" in node:
        names = list_value(node["Names"])
        it = iter(names)
        for k, v in zip(it, it):
            k = resolve1(k)
            if k == key:
                return v
        return None
    for kid in list_value(node.get("Kids", [])):
        found = _nametree_lookup(dict_value(resolve1(kid)), key)
        if found is not None:
            return found
    return None
