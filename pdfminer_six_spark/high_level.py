"""Reference-shaped high-level API (drop-in import surface for
pdfminer.high_level: extract_text / extract_pages / extract_text_to_fp,
reference high_level.py:25-227).

Note the reference's ``extract_text_to_fp`` default of ``laparams=None``
means NO layout analysis (its CLI builds LAParams explicitly); we keep
that exact contract here, while ``extract_text``/``extract_pages`` default
to ``LAParams()`` like the reference's own convenience functions.
"""

from __future__ import annotations

from pdfminer_six_spark.core.extract import (  # noqa: F401
    extract_pages,
    extract_text,
)


def extract_text_to_fp(
    inf,
    outfp,
    output_type: str = "text",
    codec: str = "utf-8",
    laparams=None,
    maxpages: int = 0,
    page_numbers=None,
    password: str = "",
    scale: float = 1.0,
    rotation: int = 0,
    layoutmode: str = "normal",
    output_dir=None,
    strip_control: bool = False,
    debug: bool = False,
    disable_caching: bool = False,
    **kwargs,
) -> None:
    from pdfminer_six_spark.core.converters import (
        extract_tags,
        pages_to_hocr,
        pages_to_html,
        pages_to_xml,
    )

    data = inf.read() if hasattr(inf, "read") else inf
    imagewriter = None
    if output_dir:
        from pdfminer_six_spark.core.image import ImageWriter

        imagewriter = ImageWriter(output_dir)

    common = dict(
        password=password, page_numbers=page_numbers, maxpages=maxpages,
        rotation=rotation, laparams=laparams,
    )
    if output_type == "text":
        out = extract_text(data, **common)
    elif output_type == "tag":
        out = extract_tags(
            data, password=password, page_numbers=page_numbers,
            maxpages=maxpages, rotation=rotation,
        )
    else:
        pages = list(extract_pages(data, **common))
        if output_type == "xml":
            out = pages_to_xml(
                pages, stripcontrol=strip_control, imagewriter=imagewriter
            )
        elif output_type == "html":
            out = pages_to_html(
                pages, scale=scale, layoutmode=layoutmode,
                imagewriter=imagewriter,
            )
        elif output_type == "hocr":
            out = pages_to_hocr(pages, stripcontrol=strip_control)
        else:
            raise ValueError(
                f"Output type can be text, html, xml or tag but is {output_type}"
            )
    if hasattr(outfp, "encoding") or not codec:
        outfp.write(out)  # text handle
    else:
        outfp.write(out.encode(codec))
