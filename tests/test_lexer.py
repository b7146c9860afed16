"""Differential tests: our tokenizer/assembler vs the reference's own
regression vectors (reference tests/test_pdfminer_psparser.py:14-151)."""

import pytest

from pdfminer_six_spark.core.lexer import Lexer
from pdfminer_six_spark.core.objects import KWD, LIT, Keyword, LexEOF, Name
from pdfminer_six_spark.core.parser import StackParser

TESTDATA = rb"""%!PS
begin end
 "  @ #
/a/BCD /Some_Name /foo#5f#xbaa
0 +1 -2 .5 1.234
(abc) () (abc ( def ) ghi)
(def\040\0\0404ghi) (bach\\slask) (foo\nbaa)
(this % is not a comment.)
(foo
baa)
(foo\
baa)
<> <20> < 40 4020 >
<abcd00
12345>
func/a/b{(c)do*}def
[ 1 (z) ! ]
<< /foo (bar) >>
"""

TOKENS = [
    (5, KWD(b"begin")), (11, KWD(b"end")), (16, KWD(b'"')), (19, KWD(b"@")),
    (21, KWD(b"#")), (23, LIT("a")), (25, LIT("BCD")), (30, LIT("Some_Name")),
    (41, LIT("foo_xbaa")), (54, 0), (56, 1), (59, -2), (62, 0.5), (65, 1.234),
    (71, b"abc"), (77, b""), (80, b"abc ( def ) ghi"), (98, b"def \x00 4ghi"),
    (118, b"bach\\slask"), (132, b"foo\nbaa"), (143, b"this % is not a comment."),
    (170, b"foo\nbaa"), (180, b"foobaa"), (191, b""), (194, b" "),
    (199, b"@@ "), (211, b"\xab\xcd\x00\x124\x05"), (226, KWD(b"func")),
    (230, LIT("a")), (232, LIT("b")), (234, KWD(b"{")), (235, b"c"),
    (238, KWD(b"do*")), (241, KWD(b"}")), (242, KWD(b"def")), (246, KWD(b"[")),
    (248, 1), (250, b"z"), (254, KWD(b"!")), (256, KWD(b"]")), (258, KWD(b"<<")),
    (261, LIT("foo")), (266, b"bar"), (272, KWD(b">>")),
]

OBJS = [
    (23, LIT("a")), (25, LIT("BCD")), (30, LIT("Some_Name")), (41, LIT("foo_xbaa")),
    (54, 0), (56, 1), (59, -2), (62, 0.5), (65, 1.234), (71, b"abc"), (77, b""),
    (80, b"abc ( def ) ghi"), (98, b"def \x00 4ghi"), (118, b"bach\\slask"),
    (132, b"foo\nbaa"), (143, b"this % is not a comment."), (170, b"foo\nbaa"),
    (180, b"foobaa"), (191, b""), (194, b" "), (199, b"@@ "),
    (211, b"\xab\xcd\x00\x124\x05"), (230, LIT("a")), (232, LIT("b")),
    (234, [b"c"]), (246, [1, b"z"]), (258, {"foo": b"bar"}),
]


class FlushingParser(StackParser):
    def flush(self):
        self.add_results(*self.popall())

    def do_keyword(self, pos, token):
        pass  # drop bare keywords, like the reference test harness


def norm(tok):
    if isinstance(tok, Name):
        return ("lit", tok.name)
    if isinstance(tok, Keyword):
        return ("kwd", tok.name)
    if isinstance(tok, list):
        return [norm(t) for t in tok]
    if isinstance(tok, dict):
        return {k: norm(v) for k, v in tok.items()}
    return tok


def test_token_vectors():
    got = [(p, norm(t)) for p, t in Lexer(TESTDATA)]
    want = [(p, norm(t)) for p, t in TOKENS]
    assert got == want


def test_object_vectors():
    p = FlushingParser(TESTDATA)
    got = []
    while True:
        try:
            pos, obj = p.nextobject()
        except LexEOF:
            break
        got.append((pos, norm(obj)))
    want = [(p_, norm(o)) for p_, o in OBJS]
    assert got == want


def test_trailing_keyword_at_eof():
    # reference issue #884: stream ending exactly on a keyword
    assert list(Lexer(b"Do")) == [(0, KWD(b"Do"))]


def test_differential_against_reference_random_buffers():
    """Fuzz-ish differential: run both lexers over assorted byte soups."""
    conftest = pytest.importorskip("tests.conftest")
    if not conftest.reference_available():
        pytest.skip("reference not present")
    conftest.import_reference()
    from io import BytesIO

    from pdfminer.psexceptions import PSEOF
    from pdfminer.psparser import PSBaseParser, PSKeyword, PSLiteral

    def ref_tokens(data):
        p = PSBaseParser(BytesIO(data))
        out = []
        while True:
            try:
                out.append(p.nexttoken())
            except PSEOF:
                return out

    def norm_ref(tok):
        if isinstance(tok, PSLiteral):
            return ("lit", tok.name)
        if isinstance(tok, PSKeyword):
            return ("kwd", tok.name)
        return tok

    cases = [
        TESTDATA,
        b"1 0 obj << /Length 5 >> stream\nhello\nendstream endobj",
        b"[(a)(b)/c 1.5e3 <</k[1 2]>>] % tail",
        b"(unterminated",
        b"<4142 43",
        b"T* 0 Tr 12 0 0 12 288 720 Tm (x)Tj",
        b"/A;Name_With-Odd***Chars /1.2 /$$ /@pattern",
        b"123 4.5 -6 +7 -.002 0.0 .x",
        b"<</Filter[/A85]/Length 1>>",
        b"end\x00begin",
        b"(a\\q\\r\\n\\t\\(b\\))",
        b"(\\0053)(\\53)(\\053)",
    ]
    for data in cases:
        ours = [(p_, norm(t)) for p_, t in Lexer(data)]
        refs = [(p_, norm_ref(t)) for p_, t in ref_tokens(data)]
        assert ours == refs, f"mismatch on {data!r}"
