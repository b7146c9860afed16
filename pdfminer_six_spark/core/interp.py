"""Content-stream interpreter (SURVEY.md §2.6) — the per-page fold.

Operator semantics per the reference (pdfminer.six pdfinterp.py:470-1447):
graphics/text state machine, ~78 ``do_*`` operators dispatched by keyword
with arity from the handler signature, XObject recursion with circular-ref
guards, rotation->initial CTM.  Dispatch here uses a precomputed
name->handler table instead of runtime ``getattr`` mangling.

This is inherently sequential state per page; in the Spark engine one page
(= one turn payload's page) is the unit of work inside a vectorized UDF.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

from pdfminer_six_spark.core.document import Page
from pdfminer_six_spark.core.fonts import Font, make_font
from pdfminer_six_spark.core.layout import (
    MATRIX_IDENTITY,
    Matrix,
    Point,
    mult_matrix,
)
from pdfminer_six_spark.core.objects import (
    LexEOF,
    Name,
    ObjRef,
    ParseError,
    StreamObject,
    dict_value,
    list_value,
    name_str,
    resolve1,
    safe_int,
    stream_value,
)
from pdfminer_six_spark.core.parser import ContentParser
from pdfminer_six_spark.core.objects import Keyword


def safe_float(x) -> Optional[float]:
    try:
        return float(x)
    except (TypeError, ValueError, OverflowError):
        # OverflowError: int wider than a double (reference casting.py:17-21)
        return None


def _safe_floats(*vals) -> Optional[Tuple[float, ...]]:
    out = []
    for v in vals:
        f = safe_float(v)
        if f is None:
            return None
        out.append(f)
    return tuple(out)


class TextState:
    __slots__ = (
        "font", "fontsize", "charspace", "wordspace", "scaling",
        "leading", "render", "rise", "matrix", "linematrix",
    )

    def __init__(self) -> None:
        self.font: Optional[Font] = None
        self.fontsize: float = 0
        self.charspace: float = 0
        self.wordspace: float = 0
        self.scaling: float = 100
        self.leading: float = 0
        self.render: int = 0
        self.rise: float = 0
        self.reset()

    def reset(self) -> None:
        self.matrix: Matrix = MATRIX_IDENTITY
        self.linematrix: Point = (0, 0)

    def copy(self) -> "TextState":
        o = TextState.__new__(TextState)
        for k in TextState.__slots__:
            setattr(o, k, getattr(self, k))
        return o


class ColorSpace:
    __slots__ = ("name", "ncomponents")

    def __init__(self, name: str, ncomponents: int) -> None:
        self.name = name
        self.ncomponents = ncomponents

    def __repr__(self) -> str:
        return f"<ColorSpace {self.name}/{self.ncomponents}>"


PREDEFINED_COLORSPACE: Dict[str, ColorSpace] = {
    name: ColorSpace(name, n)
    for name, n in (
        ("DeviceGray", 1), ("CalRGB", 3), ("CalGray", 1), ("Lab", 3),
        ("DeviceRGB", 3), ("DeviceCMYK", 4), ("Separation", 1),
        ("Indexed", 1), ("Pattern", 1),
    )
}


class GraphicState:
    __slots__ = (
        "linewidth", "linecap", "linejoin", "miterlimit", "dash",
        "intent", "flatness", "scolor", "scs", "ncolor", "ncs",
    )

    def __init__(self) -> None:
        self.linewidth: float = 0
        self.linecap = None
        self.linejoin = None
        self.miterlimit = None
        self.dash = None
        self.intent = None
        self.flatness = None
        self.scolor: Any = 0
        self.scs: ColorSpace = PREDEFINED_COLORSPACE["DeviceGray"]
        self.ncolor: Any = 0
        self.ncs: ColorSpace = PREDEFINED_COLORSPACE["DeviceGray"]

    def copy(self) -> "GraphicState":
        o = GraphicState.__new__(GraphicState)
        for k in GraphicState.__slots__:
            setattr(o, k, getattr(self, k))
        return o


class ResourceManager:
    """Per-document (and, module-level, per-executor) font cache
    (reference pdfinterp.py:184-253)."""

    def __init__(self, caching: bool = True) -> None:
        self.caching = caching
        self._cached_fonts: Dict[Any, Font] = {}

    def get_font(self, objid, spec: dict) -> Font:
        if objid and objid in self._cached_fonts:
            return self._cached_fonts[objid]
        font = make_font(spec)
        if self.caching and objid:
            self._cached_fonts[objid] = font
        return font


class Interpreter:
    """Executes one page's content streams against a device."""

    def __init__(self, rsrcmgr: ResourceManager, device) -> None:
        self.rsrcmgr = rsrcmgr
        self.device = device
        self.stream_ids: Set[int] = set()
        self.parent_stream_ids: Set[int] = set()
        self._dispatch = self._build_dispatch()

    def dup(self) -> "Interpreter":
        return self.__class__(self.rsrcmgr, self.device)

    def subinterp(self) -> "Interpreter":
        sub = self.dup()
        sub.parent_stream_ids.update(self.parent_stream_ids)
        sub.parent_stream_ids.update(self.stream_ids)
        return sub

    # --- resources ---

    def init_resources(self, resources: dict) -> None:
        self.resources = resources
        self.fontmap: Dict[str, Font] = {}
        self.xobjmap: Dict[str, Any] = {}
        self.csmap: Dict[str, ColorSpace] = dict(PREDEFINED_COLORSPACE)
        if not resources:
            return

        def get_colorspace(spec) -> Optional[ColorSpace]:
            if isinstance(spec, list) and spec:
                cs_name = name_str(spec[0])
            else:
                cs_name = name_str(spec)
            if cs_name == "ICCBased" and isinstance(spec, list) and len(spec) >= 2:
                n = stream_value(spec[1]).get("N")
                return ColorSpace(cs_name, n if isinstance(n, int) else 1)
            if cs_name == "DeviceN" and isinstance(spec, list) and len(spec) >= 2:
                return ColorSpace(cs_name, len(list_value(spec[1])))
            return PREDEFINED_COLORSPACE.get(cs_name)

        for k, v in dict_value(resources).items():
            if k == "Font":
                for fontid, spec in dict_value(v).items():
                    objid = spec.objid if isinstance(spec, ObjRef) else None
                    self.fontmap[fontid] = self.rsrcmgr.get_font(
                        objid, dict_value(spec)
                    )
            elif k == "ColorSpace":
                for csid, spec in dict_value(v).items():
                    cs = get_colorspace(resolve1(spec))
                    if cs is not None:
                        self.csmap[csid] = cs
            elif k == "XObject":
                for xobjid, strm in dict_value(v).items():
                    self.xobjmap[xobjid] = strm

    def init_state(self, ctm: Matrix) -> None:
        self.gstack: List[Tuple[Matrix, TextState, GraphicState]] = []
        self.ctm = ctm
        self.device.set_ctm(ctm)
        self.textstate = TextState()
        self.graphicstate = GraphicState()
        self.curpath: List[Tuple] = []
        self.argstack: List[Any] = []

    def push(self, obj) -> None:
        self.argstack.append(obj)

    def pop(self, n: int) -> List[Any]:
        if n == 0:
            return []
        x = self.argstack[-n:]
        del self.argstack[-n:]
        return x

    # --- graphics state ---

    def op_q(self) -> None:
        self.gstack.append(
            (self.ctm, self.textstate.copy(), self.graphicstate.copy())
        )

    def op_Q(self) -> None:
        if self.gstack:
            self.ctm, self.textstate, self.graphicstate = self.gstack.pop()
            self.device.set_ctm(self.ctm)

    def op_cm(self, a, b, c, d, e, f) -> None:
        m = _safe_floats(a, b, c, d, e, f)
        if m is not None:
            self.ctm = mult_matrix(m, self.ctm)
            self.device.set_ctm(self.ctm)

    def op_w(self, lw) -> None:
        f = safe_float(lw)
        if f is not None:
            scale = (self.ctm[0] ** 2 + self.ctm[1] ** 2) ** 0.5
            self.graphicstate.linewidth = f * scale

    def op_J(self, cap) -> None:
        self.graphicstate.linecap = cap

    def op_j(self, join) -> None:
        self.graphicstate.linejoin = join

    def op_M(self, ml) -> None:
        self.graphicstate.miterlimit = ml

    def op_d(self, dash, phase) -> None:
        self.graphicstate.dash = (dash, phase)

    def op_ri(self, intent) -> None:
        self.graphicstate.intent = intent

    def op_i(self, flatness) -> None:
        self.graphicstate.flatness = flatness

    def op_gs(self, name) -> None:
        pass  # ExtGState not modeled (matches reference TODO)

    # --- path construction ---

    def op_m(self, x, y) -> None:
        p = _safe_floats(x, y)
        if p is not None:
            self.curpath.append(("m", *p))

    def op_l(self, x, y) -> None:
        p = _safe_floats(x, y)
        if p is not None:
            self.curpath.append(("l", *p))

    def op_c(self, x1, y1, x2, y2, x3, y3) -> None:
        p = _safe_floats(x1, y1, x2, y2, x3, y3)
        if p is not None:
            self.curpath.append(("c", *p))

    def op_v(self, x2, y2, x3, y3) -> None:
        p = _safe_floats(x2, y2, x3, y3)
        if p is not None:
            self.curpath.append(("v", *p))

    def op_y(self, x1, y1, x3, y3) -> None:
        p = _safe_floats(x1, y1, x3, y3)
        if p is not None:
            self.curpath.append(("y", *p))

    def op_h(self) -> None:
        self.curpath.append(("h",))

    def op_re(self, x, y, w, h) -> None:
        p = _safe_floats(x, y, w, h)
        if p is not None:
            x, y, w, h = p
            self.curpath.extend(
                [
                    ("m", x, y),
                    ("l", x + w, y),
                    ("l", x + w, y + h),
                    ("l", x, y + h),
                    ("h",),
                ]
            )

    # --- path painting ---

    def _paint(self, stroke: bool, fill: bool, evenodd: bool) -> None:
        self.device.paint_path(
            self.graphicstate, stroke, fill, evenodd, self.curpath
        )
        self.curpath = []

    def op_S(self) -> None:
        self._paint(True, False, False)

    def op_s(self) -> None:
        self.op_h()
        self.op_S()

    def op_f(self) -> None:
        self._paint(False, True, False)

    def op_F(self) -> None:
        pass  # obsolete alias is a no-op in the reference

    def op_f_star(self) -> None:
        self._paint(False, True, True)

    def op_B(self) -> None:
        self._paint(True, True, False)

    def op_B_star(self) -> None:
        self._paint(True, True, True)

    def op_b(self) -> None:
        self.op_h()
        self.op_B()

    def op_b_star(self) -> None:
        self.op_h()
        self.op_B_star()

    def op_n(self) -> None:
        self.curpath = []

    def op_W(self) -> None:
        pass  # clipping not modeled

    def op_W_star(self) -> None:
        pass

    # --- color ---

    def op_CS(self, name) -> None:
        try:
            self.graphicstate.scs = self.csmap[name_str(name)]
        except KeyError:
            pass

    def op_cs(self, name) -> None:
        try:
            self.graphicstate.ncs = self.csmap[name_str(name)]
        except KeyError:
            pass

    def op_G(self, gray) -> None:
        f = safe_float(gray)
        if f is not None:
            self.graphicstate.scolor = f
            self.graphicstate.scs = self.csmap["DeviceGray"]

    def op_g(self, gray) -> None:
        f = safe_float(gray)
        if f is not None:
            self.graphicstate.ncolor = f
            self.graphicstate.ncs = self.csmap["DeviceGray"]

    def op_RG(self, r, g, b) -> None:
        rgb = _safe_floats(r, g, b)
        if rgb is not None:
            self.graphicstate.scolor = rgb
            self.graphicstate.scs = self.csmap["DeviceRGB"]

    def op_rg(self, r, g, b) -> None:
        rgb = _safe_floats(r, g, b)
        if rgb is not None:
            self.graphicstate.ncolor = rgb
            self.graphicstate.ncs = self.csmap["DeviceRGB"]

    def op_K(self, c, m, y, k) -> None:
        cmyk = _safe_floats(c, m, y, k)
        if cmyk is not None:
            self.graphicstate.scolor = cmyk
            self.graphicstate.scs = self.csmap["DeviceCMYK"]

    def op_k(self, c, m, y, k) -> None:
        cmyk = _safe_floats(c, m, y, k)
        if cmyk is not None:
            self.graphicstate.ncolor = cmyk
            self.graphicstate.ncs = self.csmap["DeviceCMYK"]

    @staticmethod
    def _components_color(components) -> Optional[Any]:
        if len(components) == 1:
            return safe_float(components[0])
        if len(components) == 3:
            return _safe_floats(*components)
        if len(components) == 4:
            return _safe_floats(*components)
        return None

    def _scn(self, stroking: bool) -> None:
        gs = self.graphicstate
        cs = gs.scs if stroking else gs.ncs
        components = self.pop(cs.ncomponents)
        color: Any = None
        if len(components) != cs.ncomponents:
            return
        if cs.name != "Pattern":
            color = self._components_color(components)
        elif components:
            pat = components[-1]
            if not isinstance(pat, Name):
                return
            pattern_name = name_str(pat)
            if len(components) == 1:
                color = pattern_name
            else:
                base = self._components_color(components[:-1])
                if base is None:
                    return
                color = (base, pattern_name)
        if color is None:
            return
        if stroking:
            gs.scolor = color
        else:
            gs.ncolor = color

    def op_SCN(self) -> None:
        self._scn(True)

    def op_scn(self) -> None:
        self._scn(False)

    def op_SC(self) -> None:
        self._scn(True)

    def op_sc(self) -> None:
        self._scn(False)

    def op_sh(self, name) -> None:
        pass  # shading not modeled

    # --- text object / state ---

    def op_BT(self) -> None:
        self.textstate.reset()

    def op_ET(self) -> None:
        pass

    def op_BX(self) -> None:
        pass

    def op_EX(self) -> None:
        pass

    def op_MP(self, tag) -> None:
        if isinstance(tag, Name):
            self.device.do_tag(tag)

    def op_DP(self, tag, props) -> None:
        if isinstance(tag, Name):
            self.device.do_tag(tag, props)

    def op_BMC(self, tag) -> None:
        if isinstance(tag, Name):
            self.device.begin_tag(tag)

    def op_BDC(self, tag, props) -> None:
        if isinstance(tag, Name):
            self.device.begin_tag(tag, props)

    def op_EMC(self) -> None:
        self.device.end_tag()

    def op_Tc(self, space) -> None:
        f = safe_float(space)
        if f is not None:
            self.textstate.charspace = f

    def op_Tw(self, space) -> None:
        f = safe_float(space)
        if f is not None:
            self.textstate.wordspace = f

    def op_Tz(self, scale) -> None:
        f = safe_float(scale)
        if f is not None:
            self.textstate.scaling = f

    def op_TL(self, leading) -> None:
        f = safe_float(leading)
        if f is not None:
            self.textstate.leading = -f

    def op_Tf(self, fontid, fontsize) -> None:
        try:
            self.textstate.font = self.fontmap[name_str(fontid)]
        except KeyError:
            self.textstate.font = self.rsrcmgr.get_font(None, {})
        f = safe_float(fontsize)
        if f is not None:
            self.textstate.fontsize = f

    def op_Tr(self, render) -> None:
        i = safe_int(render)
        if i is not None:
            self.textstate.render = i

    def op_Ts(self, rise) -> None:
        f = safe_float(rise)
        if f is not None:
            self.textstate.rise = f

    # --- text positioning ---

    def op_Td(self, tx, ty) -> None:
        txf, tyf = safe_float(tx), safe_float(ty)
        if txf is not None and tyf is not None:
            a, b, c, d, e, f = self.textstate.matrix
            self.textstate.matrix = (
                a, b, c, d, txf * a + tyf * c + e, txf * b + tyf * d + f
            )
        self.textstate.linematrix = (0, 0)

    def op_TD(self, tx, ty) -> None:
        txf, tyf = safe_float(tx), safe_float(ty)
        if txf is not None and tyf is not None:
            a, b, c, d, e, f = self.textstate.matrix
            self.textstate.matrix = (
                a, b, c, d, txf * a + tyf * c + e, txf * b + tyf * d + f
            )
        if tyf is not None:
            self.textstate.leading = tyf
        self.textstate.linematrix = (0, 0)

    def op_Tm(self, a, b, c, d, e, f) -> None:
        m = _safe_floats(a, b, c, d, e, f)
        if m is not None:
            self.textstate.matrix = m
            self.textstate.linematrix = (0, 0)

    def op_T_star(self) -> None:
        a, b, c, d, e, f = self.textstate.matrix
        lead = self.textstate.leading
        self.textstate.matrix = (a, b, c, d, lead * c + e, lead * d + f)
        self.textstate.linematrix = (0, 0)

    # --- text showing ---

    def op_TJ(self, seq) -> None:
        if self.textstate.font is None:
            return
        self.device.render_string(
            self.textstate, seq, self.graphicstate.ncs, self.graphicstate.copy()
        )

    def op_Tj(self, s) -> None:
        self.op_TJ([s])

    def op_quote(self, s) -> None:  # '
        self.op_T_star()
        self.op_TJ([s])

    def op_dblquote(self, aw, ac, s) -> None:  # "
        self.op_Tw(aw)
        self.op_Tc(ac)
        self.op_TJ([s])

    # --- inline images / XObjects ---

    def op_BI(self) -> None:
        pass

    def op_ID(self) -> None:
        pass

    def op_EI(self, obj) -> None:
        if isinstance(obj, StreamObject) and "W" in obj and "H" in obj:
            iobjid = str(id(obj))
            self.device.begin_figure(iobjid, (0, 0, 1, 1), MATRIX_IDENTITY)
            self.device.render_image(iobjid, obj)
            self.device.end_figure(iobjid)

    def op_Do(self, xobjid_arg) -> None:
        xobjid = name_str(xobjid_arg)
        try:
            xobj = stream_value(self.xobjmap[xobjid])
        except KeyError:
            return
        subtype = xobj.get("Subtype")
        st = name_str(subtype) if isinstance(subtype, Name) else ""
        if st == "Form" and "BBox" in xobj:
            interp = self.subinterp()
            bbox = tuple(list_value(xobj["BBox"]))
            matrix = tuple(list_value(xobj.get("Matrix", MATRIX_IDENTITY)))
            xobjres = xobj.get("Resources")
            resources = dict_value(xobjres) if xobjres else self.resources.copy()
            self.device.begin_figure(xobjid, bbox, matrix)
            interp.render_contents(
                resources, [xobj], ctm=mult_matrix(matrix, self.ctm)
            )
            self.device.end_figure(xobjid)
        elif st == "Image" and "Width" in xobj and "Height" in xobj:
            self.device.begin_figure(xobjid, (0, 0, 1, 1), MATRIX_IDENTITY)
            self.device.render_image(xobjid, xobj)
            self.device.end_figure(xobjid)

    # --- page driver ---

    def process_page(self, page: Page) -> None:
        x0, y0, x1, y1 = page.mediabox
        if page.rotate == 90:
            ctm = (0, -1, 1, 0, -y0, x1)
        elif page.rotate == 180:
            ctm = (-1, 0, 0, -1, x1, y1)
        elif page.rotate == 270:
            ctm = (0, 1, -1, 0, y1, -x0)
        else:
            ctm = (1, 0, 0, 1, -x0, -y0)
        self.device.begin_page(page, ctm)
        self.render_contents(page.resources, page.contents, ctm=ctm)
        self.device.end_page(page)

    def render_contents(
        self, resources: dict, streams: Sequence[Any], ctm: Matrix = MATRIX_IDENTITY
    ) -> None:
        self.init_resources(resources)
        self.init_state(ctm)
        self.execute(list_value(streams))

    def execute(self, streams: Sequence[Any]) -> None:
        valid: List[StreamObject] = []
        self.stream_ids.clear()
        for obj in streams:
            strm = stream_value(obj)
            if strm.objid is None:
                continue
            if strm.objid in self.parent_stream_ids:
                continue  # circular reference — refuse
            valid.append(strm)
            self.stream_ids.add(strm.objid)
        try:
            parser = ContentParser(valid)
        except (LexEOF, ParseError):
            return
        dispatch = self._dispatch
        while True:
            try:
                _, obj = parser.nextobject()
            except LexEOF:
                break
            except ParseError:
                break
            if isinstance(obj, Keyword):
                entry = dispatch.get(obj.name)
                if entry is None:
                    continue  # unknown operator: ignored (non-strict)
                func, nargs = entry
                if nargs:
                    args = self.pop(nargs)
                    if len(args) == nargs:
                        func(*args)
                else:
                    func()
            else:
                self.push(obj)

    def _build_dispatch(self) -> Dict[bytes, Tuple[Any, int]]:
        table: Dict[bytes, Tuple[Any, int]] = {}
        for attr in dir(self):
            if not attr.startswith("op_"):
                continue
            opname = (
                attr[3:]
                .replace("_star", "*")
                .replace("quote", "'")
                .replace("dbl'", '"')
            )
            func = getattr(self, attr)
            nargs = func.__func__.__code__.co_argcount - 1
            table[opname.encode("ascii")] = (func, nargs)
        return table
