"""OCR backend seam.

The reference shells out to Tesseract (helpers/Ocr.java): TSV word mode
with a PSM heuristic sweep (Ocr.java:28-72 tries PSM 6,4,11,3 and keeps
the run with the most words) and a plain-text mode for lattice cell
fallback (Ocr.java:78-96). This sandbox has no Tesseract binary and no
pytesseract, so the engine defines a backend protocol with two
implementations:

* :class:`EmbeddedWordsBackend` — the deterministic stand-in: media
  payloads carry the word layer a real OCR pass would produce (generated
  by the fixture module); ``words`` filters blanks exactly like
  Ocr.java:228-229, and ``cell_text`` returns the words whose boxes fall
  inside the requested ROI (what Tesseract would read off the crop).
  This keeps the whole extraction dataflow real — only the
  pixels→characters step is substituted.

* :class:`PytesseractBackend` — the production path, import-gated; raises
  a clearly-marked NotImplementedError when pytesseract is absent.

The PSM sweep is preserved in :func:`ocr_words_heuristic` so the adaptive
physical-strategy behavior (the reference's only cost-based choice,
SURVEY.md §4) survives with a real backend.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .docmodel import OCR_WORD_COLS, PagePayload


_UNSET = object()   # cell_text cache sentinel (None means "no words")


class OcrBackend:
    """Protocol: produce TSV-style words for a page, or plain text for a
    cell crop.

    ``reads_pixels`` tells kernels whether this backend actually consumes
    image pixels. The reference's image preprocessing (rule removal,
    upscale, re-binarization — OcrStreamParser.java:117-144,
    LatticeParser.java:207-231) exists purely to help Tesseract read the
    raster; a backend that doesn't look at pixels lets the kernel skip
    that work without changing any output."""

    reads_pixels = True

    def words(self, payload: PagePayload, image: np.ndarray, psm: int) -> pd.DataFrame:
        raise NotImplementedError

    def cell_text(self, payload: PagePayload, cell_img: np.ndarray | None,
                  bbox: tuple[int, int, int, int]) -> str:
        raise NotImplementedError


class EmbeddedWordsBackend(OcrBackend):
    """Deterministic OCR stand-in reading the payload's embedded word layer."""

    reads_pixels = False

    def words(self, payload: PagePayload, image: np.ndarray, psm: int) -> pd.DataFrame:
        w = payload.words
        if len(w) == 0:
            return w
        # Ocr.java:228-229 drops rows with empty/blank trimmed text;
        # OcrStreamParser.java:149 filters blanks again post-hoc.
        # (list-comp strip instead of two .str passes — the per-page word
        # table is tens of rows, where accessor overhead dominates)
        stripped = [str(t).strip() for t in w["text"].tolist()]
        keep = [i for i, s in enumerate(stripped) if s != ""]
        cols: dict = {}
        for c in w.columns:
            if c == "text":
                cols[c] = (stripped if len(keep) == len(stripped)
                           else [stripped[i] for i in keep])
            else:
                v = w[c].to_numpy()
                cols[c] = v if len(keep) == len(stripped) else v[keep]
        return pd.DataFrame(cols, copy=False)

    def cell_text(self, payload: PagePayload, cell_img: np.ndarray,
                  bbox: tuple[int, int, int, int]) -> str:
        """Words whose box centers fall inside bbox=(x, y, w, h) in page
        raster coordinates, reading order (top then left), joined by a
        single space — what Tesseract PSM 6 reads off the crop.

        Word arrays are extracted and reading-order-sorted once per page
        (a stable sort of the subset equals the subset of the stable
        sort), so each of the potentially many per-cell calls is pure
        numpy masking."""
        arrs = getattr(payload, "_ocr_sorted", _UNSET)
        if arrs is _UNSET:
            w = payload.words
            if len(w) == 0:
                arrs = None   # cached below: no-words pages resolve once
            else:
                left = w["left"].to_numpy(np.float64)
                top = w["top"].to_numpy(np.float64)
                cx = left + w["width"].to_numpy(np.float64) / 2.0
                cy = top + w["height"].to_numpy(np.float64) / 2.0
                order = np.lexsort((left, top))  # stable (top, left)
                texts = np.array([str(t).strip() for t in w["text"]],
                                 dtype=object)[order]
                arrs = (cx[order], cy[order], texts)
            payload._ocr_sorted = arrs  # PagePayload is a mutable dataclass
        if arrs is None:
            return ""
        cx, cy, texts = arrs
        x, y, bw, bh = bbox
        inside = (cx >= x) & (cx < x + bw) & (cy >= y) & (cy < y + bh)
        if not inside.any():
            return ""
        return " ".join(t for t in texts[inside] if t)


class PytesseractBackend(OcrBackend):
    """Real Tesseract via pytesseract (absent in this sandbox).

    ``lang``/``oem`` mirror the reference's ``tess.lang``/``tess.oem``
    system properties (Ocr.java:189-196; multi-language values like
    "eng+fra" pass through verbatim, OcrTest.java:96)."""

    def __init__(self, lang: str = "eng", oem: int = 1) -> None:
        try:
            import pytesseract  # noqa: F401
            self._pt = pytesseract
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "pytesseract is not installed in this environment; "
                "use EmbeddedWordsBackend or install tesseract+pytesseract"
            ) from e
        self.lang = lang
        self.oem = oem

    def words(self, payload: PagePayload, image: np.ndarray, psm: int) -> pd.DataFrame:  # pragma: no cover
        df = self._pt.image_to_data(
            image, lang=self.lang,
            config=(f"--oem {self.oem} --psm {psm} "
                    "-c preserve_interword_spaces=1 -c user_defined_dpi=300"),
            output_type=self._pt.Output.DATAFRAME,
        )
        df = df[df["level"] == 5]
        df = df.rename(columns={"block_num": "block", "par_num": "par",
                                "line_num": "line", "word_num": "word"})
        df["text"] = df["text"].astype(str).str.strip()
        df = df[df["text"] != ""]
        return df[OCR_WORD_COLS].reset_index(drop=True)

    def cell_text(self, payload: PagePayload, cell_img: np.ndarray,
                  bbox: tuple[int, int, int, int]) -> str:  # pragma: no cover
        return str(self._pt.image_to_string(cell_img, config="--psm 6")).strip()


@dataclass
class OcrStats:
    cells_ocred: int = 0


def default_backend(lang: str = "eng", oem: int = 1,
                    prefer: str = "auto") -> OcrBackend:
    """Prefer real Tesseract when importable, else the deterministic fake.
    ``lang``/``oem``/``prefer`` flow from ExtractConfig.tess_lang /
    tess_oem / ocr_backend; ``prefer="embedded"`` forces the word-layer
    backend regardless of what is installed (reproducible runs)."""
    if prefer == "embedded":
        return EmbeddedWordsBackend()
    try:
        return PytesseractBackend(lang=lang, oem=oem)
    except NotImplementedError:
        return EmbeddedWordsBackend()


def ocr_words_heuristic(backend: OcrBackend, payload: PagePayload,
                        image: np.ndarray, psms=(6, 4, 11, 3)) -> pd.DataFrame:
    """PSM sweep keeping the run with most words (Ocr.java:28-45; strict
    ``>`` so the first PSM wins ties)."""
    best = pd.DataFrame({c: [] for c in OCR_WORD_COLS})
    for psm in psms:
        cur = backend.words(payload, image, psm)
        if len(cur) > len(best):
            best = cur
    return best
