"""Image export sink (S11): save LTImage objects to files.

Behavior mirrors the reference exporter's dispatch order
(reference: pdfminer/image.py:106-144): raw bytes / DCT (JPEG) passthrough
/ JPX / JBIG2 wrap / 1-bit + 8-bit-gray + 8-bit-RGB bitmaps as BMP /
flate-decoded bytes / raw fallback.  Differences, all documented:

  * BMP rows are emitted as one zero-padded buffer instead of seek-writes,
    so files always contain the full declared data size (the reference can
    truncate the final row's 4-byte alignment padding, image.py:218-235);
  * paths that require Pillow in the reference (_save_bytes re-encode,
    CMYK JPEG inversion, JPEG2000 re-encode, image.py:147-188) degrade to
    writing the undecoded bytes when Pillow is absent (this container has
    no PIL); with Pillow installed the reference-equivalent re-encode runs.

CCITTFax (K=-1) image data is decoded for real via core/ccitt.py, so 1-bit
fax images export as valid BMPs rather than opaque bytes.
"""

from __future__ import annotations

import os
import struct
from typing import Optional, Tuple

from pdfminer_six_spark.core import jbig2 as _jbig2
from pdfminer_six_spark.core.layout import LTImage
from pdfminer_six_spark.core.objects import Name, name_str, resolve1

try:  # optional, not in the default environment
    from PIL import Image as _PILImage
    from PIL import ImageChops as _PILImageChops
    from PIL import ImageOps as _PILImageOps
except ImportError:  # pragma: no cover - exercised implicitly in CI
    _PILImage = _PILImageChops = _PILImageOps = None

_DCT = {"DCTDecode", "DCT"}
_JPX = {"JPXDecode"}
_JBIG2 = {"JBIG2Decode"}
_FLATE = {"FlateDecode", "Fl"}

_RGB_NAMES = {"DeviceRGB", "RGB"}
_GRAY_NAMES = {"DeviceGray", "G"}
_CMYK_NAMES = {"DeviceCMYK", "CMYK"}


def _align32(n: int) -> int:
    return (n + 3) & ~3


def bmp_bytes(bits: int, width: int, height: int, data: bytes) -> bytes:
    """Assemble a bottom-up BMP (BITMAPINFOHEADER) from packed rows of
    ``(width*bits+7)//8`` bytes; 1-bit gets a B&W palette, 8-bit a
    grayscale palette, 24-bit none (same palettes as image.py:35-89)."""
    if bits == 1:
        ncols = 2
    elif bits == 8:
        ncols = 256
    elif bits == 24:
        ncols = 0
    else:
        raise ValueError(f"unsupported BMP depth: {bits}")
    row_in = (width * bits + 7) // 8
    linesize = _align32(row_in)
    datasize = linesize * height
    headersize = 14 + 40 + ncols * 4
    out = [
        struct.pack("<ccIHHI", b"B", b"M", headersize + datasize, 0, 0, headersize),
        struct.pack(
            "<IiiHHIIIIII", 40, width, height, 1, bits, 0, datasize, 0, 0, ncols, 0
        ),
    ]
    if ncols == 2:
        out.extend(struct.pack("BBBx", v, v, v) for v in (0, 255))
    elif ncols == 256:
        out.extend(struct.pack("BBBx", v, v, v) for v in range(256))
    pad = b"\x00" * (linesize - row_in)
    for y in range(height - 1, -1, -1):
        row = data[y * row_in : (y + 1) * row_in]
        out.append(row + b"\x00" * (row_in - len(row)) + pad)
    return b"".join(out)


def _cs_names(image: LTImage) -> set:
    names = set()
    for cs in image.colorspace or []:
        cs = resolve1(cs)
        if isinstance(cs, Name):
            names.add(name_str(cs))
        elif isinstance(cs, str):
            names.add(cs)
    return names


def export_image_bytes(image: LTImage) -> Tuple[str, bytes]:
    """In-memory variant of ImageWriter.export_image: same format dispatch
    (image.py:106-144 in the reference), returning ``(ext, payload)``
    instead of writing a file.  Paths that would need Pillow re-encoding
    fall back to the undecoded stream bytes.  Used by the distributed
    image-extraction operator (spark/sources.py), where workers must not
    write local files."""
    width, height = image.srcsize
    filters = image.stream.get_filters()
    if filters and filters[-1][0] in _DCT:
        return ".jpg", image.stream.get_data()
    if filters and filters[-1][0] in _JPX:
        return ".jp2", image.stream.get_data()
    if filters and any(f in _JBIG2 for f, _ in filters):
        globals_data = b""
        for fname, params in filters:
            if fname in _JBIG2:
                g = resolve1(params.get("JBIG2Globals"))
                if g is not None:
                    globals_data = g.get_data()
        return ".jb2", _jbig2.embedded_to_file(image.stream.get_data(), globals_data)
    if filters and image.bits == 1:
        data = image.stream.get_data()[: ((width + 7) // 8) * height]
        return ".bmp", bmp_bytes(1, width, height, data)
    if filters and image.bits == 8 and _cs_names(image) & _RGB_NAMES:
        data = image.stream.get_data()[: width * 3 * height]
        return ".bmp", bmp_bytes(24, width, height, data)
    if filters and image.bits == 8 and _cs_names(image) & _GRAY_NAMES:
        data = image.stream.get_data()[: width * height]
        return ".bmp", bmp_bytes(8, width, height, data)
    ext = f".{image.bits}.{width}x{height}.img"
    return ext, image.stream.get_data()


class ImageWriter:
    """Save LTImage objects under ``outdir``; returns the file name used.

    Mirrors the reference's collision policy: ``<name><ext>``, then
    ``<name>.<i><ext>`` (image.py:286-293)."""

    def __init__(self, outdir: str) -> None:
        self.outdir = outdir
        os.makedirs(self.outdir, exist_ok=True)

    # -- public API ---------------------------------------------------

    def export_image(self, image: LTImage) -> str:
        width, height = image.srcsize
        filters = image.stream.get_filters()
        if not filters:
            name = self._save_bytes(image)
        elif filters[-1][0] in _DCT:
            name = self._save_jpeg(image)
        elif filters[-1][0] in _JPX:
            name = self._save_jpeg2000(image)
        elif any(f in _JBIG2 for f, _ in filters):
            name = self._save_jbig2(image)
        elif image.bits == 1:
            name = self._save_bmp(image, width, height, (width + 7) // 8, 1)
        elif image.bits == 8 and _cs_names(image) & _RGB_NAMES:
            name = self._save_bmp(image, width, height, width * 3, 24)
        elif image.bits == 8 and _cs_names(image) & _GRAY_NAMES:
            name = self._save_bmp(image, width, height, width, 8)
        elif len(filters) == 1 and filters[0][0] in _FLATE:
            name = self._save_bytes(image)
        else:
            name = self._save_raw(image)
        return name

    # -- format writers -----------------------------------------------

    def _save_jpeg(self, image: LTImage) -> str:
        data = image.stream.get_data()
        name, path = self._unique_name(image, ".jpg")
        with open(path, "wb") as fp:
            if _cs_names(image) & _CMYK_NAMES and _PILImage is not None:
                from io import BytesIO

                img = _PILImage.open(BytesIO(data))
                _PILImageChops.invert(img).convert("RGB").save(fp, "JPEG")
            else:
                # Adobe CMYK JPEGs are stored inverted; without Pillow we
                # keep the raw stream (the reference hard-requires Pillow
                # here, image.py:153-165)
                fp.write(data)
        return name

    def _save_jpeg2000(self, image: LTImage) -> str:
        data = image.stream.get_data()
        name, path = self._unique_name(image, ".jp2")
        with open(path, "wb") as fp:
            if _PILImage is not None:
                from io import BytesIO

                _PILImage.open(BytesIO(data)).save(fp, "JPEG2000")
            else:
                fp.write(data)
        return name

    def _save_jbig2(self, image: LTImage) -> str:
        name, path = self._unique_name(image, ".jb2")
        globals_data = b""
        for fname, params in image.stream.get_filters():
            if fname in _JBIG2:
                g = resolve1(params.get("JBIG2Globals"))
                if g is not None:
                    globals_data = g.get_data()
        with open(path, "wb") as fp:
            fp.write(_jbig2.embedded_to_file(image.stream.get_data(), globals_data))
        return name

    def _save_bmp(
        self, image: LTImage, width: int, height: int, row_bytes: int, bits: int
    ) -> str:
        name, path = self._unique_name(image, ".bmp")
        data = image.stream.get_data()
        with open(path, "wb") as fp:
            fp.write(bmp_bytes(bits, width, height, data[: row_bytes * height]))
        return name

    def _save_bytes(self, image: LTImage) -> str:
        """Decoded-bytes path; with Pillow this re-encodes like the
        reference (image.py:237-267), otherwise falls back to raw."""
        if _PILImage is None:
            return self._save_raw(image)
        name, path = self._unique_name(image, ".jpg")
        data = image.stream.get_data()
        width, height = image.srcsize
        channels = len(data) / width / height / (image.bits / 8)
        mode: Optional[str] = None
        if image.bits == 1:
            mode = "1"
        elif image.bits == 8 and channels == 1:
            mode = "L"
        elif image.bits == 8 and channels == 3:
            mode = "RGB"
        elif image.bits == 8 and channels == 4:
            mode = "CMYK"
        if mode is None:
            os.remove(path) if os.path.exists(path) else None
            return self._save_raw(image)
        img = _PILImage.frombytes(mode, image.srcsize, data, "raw")
        if mode == "L":
            img = _PILImageOps.invert(img)
        with open(path, "wb") as fp:
            img.save(fp)
        return name

    def _save_raw(self, image: LTImage) -> str:
        ext = f".{image.bits}.{image.srcsize[0]}x{image.srcsize[1]}.img"
        name, path = self._unique_name(image, ext)
        with open(path, "wb") as fp:
            fp.write(image.stream.get_data())
        return name

    def _unique_name(self, image: LTImage, ext: str) -> Tuple[str, str]:
        name = image.name + ext
        path = os.path.join(self.outdir, name)
        i = 0
        while os.path.exists(path):
            name = f"{image.name}.{i}{ext}"
            path = os.path.join(self.outdir, name)
            i += 1
        return name, path
