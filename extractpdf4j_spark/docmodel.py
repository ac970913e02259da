"""Interleaved text+media document model: span (de)serialization.

The engine's input is the BASELINE.json ``input_hint`` shape:

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

* ``kind='text'``  — the text layer of ONE page, serialized as glyph runs
  (the Spark analog of PDFBox's per-page ``TextPosition`` stream that the
  reference collects in StreamParser.java:106-117 and
  LatticeParser.java:331-345). Format::

      p=<page>\n
      x|y|w|h|token\n      (one line per positioned run; floats %.4f)

  Coordinates are PDF points, origin bottom-left (y grows upward), so the
  stream parser's descending Y-bucket order (StreamParser.java:121) yields
  top-to-bottom reading order and the lattice transform
  ``cy_img=(pageH-cy)*dpi/72`` (LatticeParser.java:339-340) flips into
  raster space.

* ``kind='media'`` — one rendered page raster; ``media_ref`` keys a row of
  the side table ``media(media_ref string, doc_id string, page int,
  payload binary)``. The payload is an npz archive holding the grayscale
  raster, page geometry, and (for this sandbox, which has no Tesseract)
  the deterministic OCR word layer a real OCR backend would produce — see
  ``ocr.py`` for the backend seam.

Output ``documents_extracted`` uses the same spans schema: the winning
strategy's tables re-serialized as an ordered span sequence (the equality
surface — kind, text, media_ref, order):

    ('media', '',      'table:<strategy>:p<page>:<nrows>x<ncols>', off)
    ('text',  cell,    'r<r>c<c>',                                 off)...
    ... cells in row-major order, one table after another, page ascending.
"""

from __future__ import annotations

import io
import pickle
import re
import struct
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .table import Table

TEXT = "text"
MEDIA = "media"

OCR_WORD_COLS = ["left", "top", "width", "height", "conf", "text",
                 "block", "par", "line", "word"]


# ---------------------------------------------------------------------------
# Text spans (glyph runs)
# ---------------------------------------------------------------------------

def encode_text_span(page: int, runs: list[tuple[float, float, float, float, str]]) -> str:
    """Serialize one page's glyph runs: (x, y, w, h, token) tuples."""
    lines = [f"p={page}"]
    for x, y, w, h, tok in runs:
        lines.append(f"{x:.4f}|{y:.4f}|{w:.4f}|{h:.4f}|{tok}")
    return "\n".join(lines)


@dataclass
class GlyphRuns:
    page: int
    x: np.ndarray      # float64
    y: np.ndarray
    w: np.ndarray
    h: np.ndarray
    tokens: np.ndarray  # object (str)

    @property
    def n(self) -> int:
        return len(self.x)


def decode_text_span(text: str) -> GlyphRuns:
    """Parse the glyph-run serialization back into numpy columns."""
    lines = text.split("\n")
    head = lines[0]
    if not head.startswith("p="):
        raise ValueError(f"bad text span header: {head!r}")
    page = int(head[2:])
    n = len(lines) - 1
    x = np.empty(n); y = np.empty(n); w = np.empty(n); h = np.empty(n)
    toks = np.empty(n, dtype=object)
    for i, ln in enumerate(lines[1:]):
        xs, ys, ws, hs, tok = ln.split("|", 4)
        x[i] = float(xs); y[i] = float(ys); w[i] = float(ws); h[i] = float(hs)
        toks[i] = tok
    return GlyphRuns(page, x, y, w, h, toks)


def decode_glyph_blob(page: int, blob: str | None) -> GlyphRuns:
    """Decode the glyph lines (header already stripped by the Spark-native
    explode stage). Empty/None blob → zero runs."""
    if blob is None or blob == "":
        z = np.empty(0)
        return GlyphRuns(page, z, z.copy(), z.copy(), z.copy(),
                         np.empty(0, dtype=object))
    lines = blob.split("\n")
    n = len(lines)
    x = np.empty(n); y = np.empty(n); w = np.empty(n); h = np.empty(n)
    toks = np.empty(n, dtype=object)
    for i, ln in enumerate(lines):
        xs, ys, ws, hs, tok = ln.split("|", 4)
        x[i] = float(xs); y[i] = float(ys); w[i] = float(ws); h[i] = float(hs)
        toks[i] = tok
    return GlyphRuns(page, x, y, w, h, toks)


# ---------------------------------------------------------------------------
# Media payloads
# ---------------------------------------------------------------------------

class PagePayload:
    """One page's raster + OCR word layer.

    ``words`` (the OCR_WORD_COLS frame) is constructed lazily from
    ``word_arrays`` when decode supplied raw columns — building a pandas
    frame per payload was a measured decode hot spot, and pages without
    words never need one."""

    def __init__(self, page: int, image: np.ndarray, dpi: float,
                 page_width_pt: float, page_height_pt: float,
                 words: pd.DataFrame | None = None,
                 word_arrays: dict | None = None):
        self.page = page
        self.image = image                  # uint8 grayscale raster
        self.dpi = dpi                      # pixels = points*dpi/72
        self.page_width_pt = page_width_pt
        self.page_height_pt = page_height_pt
        self._words = words
        self._word_arrays = word_arrays

    @property
    def words(self) -> pd.DataFrame:
        if self._words is None:
            wa = self._word_arrays
            if wa is None:
                wa = {c: [] for c in OCR_WORD_COLS}
            self._words = pd.DataFrame(wa, copy=False)
        return self._words


def encode_media_payload(page: int, image: np.ndarray, dpi: float,
                         page_width_pt: float, page_height_pt: float,
                         words: pd.DataFrame | None = None) -> bytes:
    """Serialize a page raster + OCR word layer as compressed npz bytes."""
    if words is None:
        words = pd.DataFrame({c: [] for c in OCR_WORD_COLS})
    image = np.ascontiguousarray(image, dtype=np.uint8)
    # bilevel rasters (the common scanned-page case) pack 8 pixels/byte:
    # decode is a 0.05 ms unpackbits instead of a ~3 ms zlib inflate
    vals = np.unique(image)
    bilevel = len(vals) <= 2 and set(vals.tolist()) <= {0, 255}
    img_fields = (
        {"image_bits": np.packbits(image > 127),
         "image_shape": np.asarray(image.shape, dtype=np.int64)}
        if bilevel else {"image": image})
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        page=np.int64(page),
        **img_fields,
        dpi=np.float64(dpi),
        page_width_pt=np.float64(page_width_pt),
        page_height_pt=np.float64(page_height_pt),
        ocr_left=words["left"].to_numpy(np.int32),
        ocr_top=words["top"].to_numpy(np.int32),
        ocr_width=words["width"].to_numpy(np.int32),
        ocr_height=words["height"].to_numpy(np.int32),
        ocr_conf=words["conf"].to_numpy(np.int32),
        ocr_block=words["block"].to_numpy(np.int32),
        ocr_par=words["par"].to_numpy(np.int32),
        ocr_line=words["line"].to_numpy(np.int32),
        ocr_word=words["word"].to_numpy(np.int32),
        ocr_text=np.asarray(words["text"].tolist(), dtype=object),
    )
    return buf.getvalue()


# --- minimal npz reader -----------------------------------------------------
# np.load on an npz archive pays per-member zipfile.open + npy header
# ast.literal_eval; at one payload per page that machinery was a measured
# ~20% of stage-1 kernel CPU. The layout np.savez_compressed writes is a
# plain sequential zip (seekable sink → sizes in the local headers, no
# data descriptors), so a linear local-header walk + zlib + np.frombuffer
# reads the identical bytes; any structural surprise falls back to np.load.

_NPY_HDR_RE = re.compile(
    rb"'descr': '([^']+)', 'fortran_order': (False|True), "
    rb"'shape': \(([0-9, ]*)\)")


def _parse_npy(buf: bytes) -> np.ndarray:
    if buf[:6] != b"\x93NUMPY":
        raise ValueError("not npy")
    if buf[6] == 1:
        off = 10 + struct.unpack_from("<H", buf, 8)[0]
    else:
        off = 12 + struct.unpack_from("<I", buf, 8)[0]
    m = _NPY_HDR_RE.search(buf[:off])
    if m is None:
        raise ValueError("npy header")
    descr = m.group(1).decode()
    shape = tuple(int(x) for x in m.group(3).split(b",") if x.strip())
    if descr == "|O":
        return pickle.loads(buf[off:])
    a = np.frombuffer(buf, dtype=np.dtype(descr), offset=off)
    order = "F" if m.group(2) == b"True" else "C"
    return a.reshape(shape, order=order)


def _fast_npz(data: bytes) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    off = 0
    n = len(data)
    while off + 30 <= n and data[off:off + 4] == b"PK\x03\x04":
        flags, method = struct.unpack_from("<HH", data, off + 6)
        csize, usize = struct.unpack_from("<II", data, off + 18)
        nlen, elen = struct.unpack_from("<HH", data, off + 26)
        if flags & 0x08:
            raise ValueError("streamed member")  # → np.load fallback
        name = data[off + 30:off + 30 + nlen].decode()
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            # numpy writes with force_zip64: real sizes live in the 0x0001
            # extra field (uncompressed first, then compressed, 8B each,
            # present only for the 0xFFFFFFFF-masked header fields)
            e0 = off + 30 + nlen
            end = e0 + elen
            found = False
            while e0 + 4 <= end:
                fid, flen = struct.unpack_from("<HH", data, e0)
                if fid == 0x0001:
                    p = e0 + 4
                    if usize == 0xFFFFFFFF:
                        usize = struct.unpack_from("<Q", data, p)[0]
                        p += 8
                    if csize == 0xFFFFFFFF:
                        csize = struct.unpack_from("<Q", data, p)[0]
                    found = True
                    break
                e0 += 4 + flen
            if not found:
                raise ValueError("zip64 sizes missing")
        start = off + 30 + nlen + elen
        raw = data[start:start + csize]
        buf = zlib.decompress(raw, -15) if method == 8 else raw
        if not name.endswith(".npy"):
            raise ValueError("unexpected member")
        out[name[:-4]] = _parse_npy(buf)
        off = start + csize
    if not out:
        raise ValueError("no members")
    return out


def decode_media_payload(payload: bytes) -> PagePayload:
    try:
        z = _fast_npz(payload)
    except Exception:
        with np.load(io.BytesIO(payload), allow_pickle=True) as zf:
            z = {k: zf[k] for k in zf.files}
    word_arrays = {
        "left": z["ocr_left"], "top": z["ocr_top"],
        "width": z["ocr_width"], "height": z["ocr_height"],
        "conf": z["ocr_conf"], "text": list(z["ocr_text"]),
        "block": z["ocr_block"], "par": z["ocr_par"],
        "line": z["ocr_line"], "word": z["ocr_word"],
    }
    if "image_bits" in z:
        h, w = (int(v) for v in z["image_shape"])
        image = (np.unpackbits(z["image_bits"], count=h * w)
                 .reshape(h, w) * np.uint8(255))
    else:
        image = np.ascontiguousarray(z["image"])  # writable (frombuffer view)
    return PagePayload(
        page=int(z["page"]),
        image=image,
        dpi=float(z["dpi"]),
        page_width_pt=float(z["page_width_pt"]),
        page_height_pt=float(z["page_height_pt"]),
        word_arrays=word_arrays,
    )


# ---------------------------------------------------------------------------
# Output span serialization (the equality surface)
# ---------------------------------------------------------------------------

def serialize_tables(tables: list[tuple[int, str, Table]]) -> list[dict]:
    """Re-serialize winning tables as the ordered output span sequence.

    ``tables`` is [(page, strategy, Table)] already in page-ascending
    order. Returns span dicts (kind, text, media_ref, offset).
    """
    spans: list[dict] = []
    off = 0
    for page, strategy, t in tables:
        spans.append({
            "kind": MEDIA, "text": "",
            "media_ref": f"table:{strategy}:p{page}:{t.nrows}x{t.ncols}",
            "offset": off,
        })
        off += 1
        for r in range(t.nrows):
            for c in range(t.ncols):
                spans.append({
                    "kind": TEXT, "text": t.cell(r, c),
                    "media_ref": f"r{r}c{c}", "offset": off,
                })
                off += 1
    return spans
