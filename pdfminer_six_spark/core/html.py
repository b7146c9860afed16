"""HTML main-content extraction (boilerplate strip).

The transcripts table carries HTML-wrapped turns
(``<html><body>…nav/footer…<main>TEXT</main>…``, FIXTURES.md §1).  This
kernel extracts the main content deterministically:

1. drop non-content subtrees (script/style/template/noscript, and the
   classic boilerplate containers nav/header/footer/aside),
2. if a ``<main>`` element (or role="main") exists, return its text,
3. otherwise fall back to the highest text-density block element
   (a DOM heuristic in the spirit of trafilatura/boilerpipe, but
   dependency-free and deterministic).

Pure ``str -> str`` — wrapped in the same vectorized UDF as the PDF kernel.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple

_DROP = {"script", "style", "template", "noscript", "svg", "iframe"}
_BOILERPLATE = {"nav", "header", "footer", "aside"}
_BLOCK = {
    "p", "div", "article", "section", "main", "body", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "tr",
    "ul", "ol", "table", "br",
}


class _Node:
    __slots__ = ("tag", "parent", "children", "texts", "is_main")

    def __init__(self, tag: str, parent: Optional["_Node"]) -> None:
        self.tag = tag
        self.parent = parent
        self.children: List["_Node"] = []
        self.texts: List[str] = []
        self.is_main = False


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", None)
        self.cur = self.root
        self.drop_depth = 0
        self.boiler_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag in _BOILERPLATE:
            self.boiler_depth += 1
            return
        if self.boiler_depth:
            return
        node = _Node(tag, self.cur)
        attrs_d = dict(attrs)
        if tag == "main" or attrs_d.get("role") == "main":
            node.is_main = True
        self.cur.children.append(node)
        if tag != "br":  # void element, don't descend
            self.cur = node

    def handle_endtag(self, tag):
        if tag in _DROP:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if self.drop_depth:
            return
        if tag in _BOILERPLATE:
            self.boiler_depth = max(0, self.boiler_depth - 1)
            return
        if self.boiler_depth:
            return
        # pop to the nearest matching open tag
        node = self.cur
        while node is not self.root:
            if node.tag == tag:
                self.cur = node.parent
                return
            node = node.parent

    def handle_data(self, data):
        if self.drop_depth or self.boiler_depth:
            return
        if data:
            self.cur.texts.append(data)


_BLOCK_BREAK = "\x00"


def _collect_text(node: _Node, out: List[str]) -> None:
    out.extend(node.texts)
    for child in node.children:
        if child.tag in _BLOCK:
            out.append(_BLOCK_BREAK)
        _collect_text(child, out)


def _node_text(node: _Node) -> str:
    parts: List[str] = []
    _collect_text(node, parts)
    # per HTML whitespace rules, newlines inside text are just whitespace;
    # only block-element boundaries become line breaks
    lines = []
    for raw_line in "".join(parts).split(_BLOCK_BREAK):
        line = " ".join(raw_line.split())
        if line:
            lines.append(line)
    return "\n".join(lines)


def _find_main(node: _Node) -> Optional[_Node]:
    if node.is_main:
        return node
    for child in node.children:
        found = _find_main(child)
        if found is not None:
            return found
    return None


def _densest_block(node: _Node) -> Tuple[int, Optional[_Node]]:
    """(text_length, node) of the block subtree with the most direct text."""
    own = sum(len(" ".join(t.split())) for t in node.texts)
    best_len, best = own, node if node.tag in _BLOCK else None
    total = own
    for child in node.children:
        clen, cbest = _densest_block(child)
        total += clen
        if cbest is not None and clen > best_len:
            best_len, best = clen, cbest
    return (total, best if best is not None else None)


def extract_main_text(html: str) -> str:
    """Main-content text of an HTML document (boilerplate stripped)."""
    parser = _MainContentParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    main = _find_main(parser.root)
    if main is not None:
        return _node_text(main)
    _, best = _densest_block(parser.root)
    if best is not None:
        return _node_text(best)
    return _node_text(parser.root)
