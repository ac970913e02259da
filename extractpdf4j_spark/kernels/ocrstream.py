"""OCR-stream strategy: header-aware OCR word layout, vectorized.

Re-expresses OcrStreamParser.java over a page raster payload:

1.  preprocess: gaussian adaptive 31/15 BINARY_INV; removeRules (morph-open
    h/v kernels, OR, subtract); 1x1 dilate (no-op kept for parity);
    invert to black-on-white          — OcrStreamParser.java:117-144,215-231
2.  TSV OCR words (psm 6), blank-filtered      — OcrStreamParser.java:147-150
3.  line grouping by (block,par,line) first-appearance order; lines sorted
    by min top, words by left (stable)         — OcrStreamParser.java:153-158
4.  required-headers gate (per document, never a process kill)
                                               — OcrStreamParser.java:160-162,234-239,301-313
5.  header-anchored column bounds: in the top region (cutoff = firstTop +
    int(pageWidth*0.35)), a line fuzzy-matching >=4 of
    {date,description,debit,credit,balance} anchors bounds at midpoints of
    the matched headers' sorted lefts          — OcrStreamParser.java:241-296
6.  fallback separator histogram: gaps>18 vote mid/20 bins; peaks need
    max(3, nlines/3) votes; merged within 30; margins 25 dropped
                                               — OcrStreamParser.java:357-387
7.  word→cell assignment: right-edge-1 anchor for numeric-like words else
    center; locate() clamped to last column; the first header-looking line
    is skipped; all-blank rows dropped         — OcrStreamParser.java:181-199,338-353
8.  column type inference + amount/date normalization (>=60% votes)
                                               — OcrStreamParser.java:400-438
9.  row bounds from ALL lines: (minTop+maxBot)/2 — OcrStreamParser.java:204-209
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import imageops
from ..docmodel import PagePayload
from ..ocr import OcrBackend
from ..table import Table
from ..textnorm import (EXPECTED_HEADERS, edit_distance, fuzzy_header_match,
                        is_likely_numeric, normalize_alpha,
                        normalize_numeric_like_columns)

GAP_MIN = 18         # OcrStreamParser.java:365
BIN = 20             # OcrStreamParser.java:369
MERGE_TOL = 30       # OcrStreamParser.java:384
MARGIN = 25          # OcrStreamParser.java:386
HEADER_REGION = 0.35  # OcrStreamParser.java:251
DEFAULT_PSM = 6      # Ocr.java:192 (tess.psm default)


def preprocess_page(gray: np.ndarray) -> np.ndarray:
    """Steps of OcrStreamParser.extractFromPage:117-144 before OCR."""
    bin_inv = imageops.adaptive_threshold(gray, 31, 15, method="gaussian",
                                          invert=True)
    no_lines = imageops.remove_rules(bin_inv)
    # 1x1 dilation is the identity; kept for parity with :130-131
    cleaned = np.uint8(255) - no_lines
    return cleaned


def group_lines(words: pd.DataFrame) -> list[pd.DataFrame]:
    """Group words into logical lines (OcrStreamParser.java:153-158)."""
    if len(words) == 0:
        return []
    # first-appearance order of (block,par,line), then sort lines by min
    # top (stable), words inside each line by left (stable).
    # groupby(sort=False) preserves first-appearance key order and
    # intra-group row order — one pass instead of a mask per key.
    key = (words["block"].astype(str) + ":" + words["par"].astype(str)
           + ":" + words["line"].astype(str))
    lines = [g for _, g in words.groupby(key.to_numpy(), sort=False)]
    lines.sort(key=lambda ln: int(ln["top"].min()))
    return [ln.sort_values("left", kind="stable") for ln in lines]


def _norms(line: pd.DataFrame) -> list[str]:
    """Normalized word texts; uses the per-page precomputed ``_norm``
    column when present (ocrstream_extract_page adds it once) so each
    word is normalized once per page, not once per matching pass."""
    if "_norm" in line.columns:
        return line["_norm"].tolist()
    return [normalize_alpha(str(t)) for t in line["text"]]


def match_header(line: pd.DataFrame) -> dict[str, float]:
    """OcrStreamParser.matchHeader:282-296 — each word claims the first
    unclaimed expected header it fuzzy-matches. Returns target → the
    matched word's left edge (the only attribute downstream uses)."""
    out: dict[str, float] = {}
    lefts = line["left"].to_numpy()
    for i, n in enumerate(_norms(line)):
        for target in EXPECTED_HEADERS:
            if target in out:
                continue
            if fuzzy_header_match(n, target):
                out[target] = float(lefts[i])
                break
    return out


def looks_like_header(line: pd.DataFrame) -> bool:
    """OcrStreamParser.java:338-347 — >=3 words hitting any target."""
    hit = 0
    for n in _norms(line):
        for target in EXPECTED_HEADERS:
            if fuzzy_header_match(n, target):
                hit += 1
                break
    return hit >= 3


def header_anchored_bounds(lines: list[pd.DataFrame], page_width: int) -> list[float] | None:
    """OcrStreamParser.java:246-279."""
    if not lines:
        return None
    first_top = int(lines[0]["top"].min())
    cutoff_y = first_top + int(page_width * HEADER_REGION)
    for ln in lines:
        top = int(ln["top"].min())
        if top > cutoff_y:
            break
        match = match_header(ln)
        if len(match) >= 4:
            xs = [match[h] for h in EXPECTED_HEADERS if h in match]
            if len(xs) >= 3:
                xs.sort()
                bounds = [0.0]
                for i in range(len(xs) - 1):
                    bounds.append((xs[i] + xs[i + 1]) / 2.0)
                bounds.append(float(page_width))
                return bounds
    return None


def infer_separators(lines: list[pd.DataFrame], page_width: int) -> list[int]:
    """OcrStreamParser.java:357-387 (Java int division throughout)."""
    mids: list[int] = []
    for ln in lines:
        if len(ln) < 2:
            continue
        left = ln["left"].to_numpy(np.int64)
        width = ln["width"].to_numpy(np.int64)
        right_a = left[:-1] + width[:-1]
        gap = left[1:] - right_a
        m = gap > GAP_MIN
        mids.extend((right_a[m] + gap[m] // 2).tolist())
    if not mids:
        return []
    hist: dict[int, int] = {}
    for x in mids:
        k = max(0, min(page_width, x)) // BIN
        hist[k] = hist.get(k, 0) + 1
    min_votes = max(3, len(lines) // 3)
    peaks = sorted(k * BIN for k, v in hist.items() if v >= min_votes)
    seps: list[int] = []
    last = -10_000
    for x in peaks:
        if not seps or abs(x - last) > MERGE_TOL:
            seps.append(x)
            last = x
    return [x for x in seps if MARGIN < x < page_width - MARGIN]


def _locate_clamped(bounds: list[float], x: float) -> int:
    """OcrStreamParser.locate:392-395 — clamped to max(0, ncols-1)."""
    for i in range(len(bounds) - 1):
        if bounds[i] <= x < bounds[i + 1]:
            return i
    return max(0, len(bounds) - 2)


def matches_required_headers(line: pd.DataFrame, required: tuple[str, ...]) -> bool:
    """OcrStreamParser.matchRequiredHeaders:301-313 (equality or
    editDistance<=1 — note: NO containment rule here)."""
    found: list[str] = []
    for n in _norms(line):
        for req in required:
            if req in found:
                continue
            if n == req or edit_distance(n, req) <= 1:
                found.append(req)
    return len(found) == len(required)


def ocrstream_extract_page(payload: PagePayload | None, backend: OcrBackend,
                           required_headers: tuple[str, ...] = (),
                           psm: int = DEFAULT_PSM) -> tuple[Table, bool]:
    """Extract one page; returns (table, required_headers_found_on_page).

    Without a raster payload there is nothing to OCR → empty table (the
    reference would rasterize the page; text-layer pages route to the
    stream strategy in our document model)."""
    if payload is None:
        return Table([], [], []), False

    # rule removal / rebinarization exist to help a pixel-reading OCR
    # engine; every downstream use of `cleaned` is shape-preserving, so a
    # pixel-free backend sees identical output without the image work
    if backend.reads_pixels:
        cleaned = preprocess_page(payload.image)
    else:
        cleaned = payload.image
    words = backend.words(payload, cleaned, psm)
    txt = words["text"].astype(str).str.strip() if len(words) else pd.Series([], dtype=str)
    words = words[txt != ""] if len(words) else words
    if len(words) == 0:
        return Table([], [], []), False

    # normalize every word ONCE per page; the header-matching passes
    # (required gate, anchor search, header-skip) reuse the cached column
    words = words.assign(
        _norm=[normalize_alpha(str(t)) for t in words["text"]])
    lines = group_lines(words)

    headers_found = False
    if required_headers:
        headers_found = any(
            matches_required_headers(ln, required_headers) for ln in lines)

    page_width = cleaned.shape[1]
    col_bounds = header_anchored_bounds(lines, page_width)
    if col_bounds is None:
        seps = infer_separators(lines, page_width)
        col_bounds = [0.0] + [float(s) for s in seps] + [float(page_width)]

    ncols = max(1, len(col_bounds) - 1)

    grid: list[list[str]] = []
    header_passed = False
    for ln in lines:
        if not header_passed and looks_like_header(ln):
            header_passed = True
            continue
        row = ["" for _ in range(ncols)]
        lefts = ln["left"].to_numpy(np.float64)
        widths = ln["width"].to_numpy(np.float64)
        texts = ln["text"].astype(str).tolist()
        numeric = np.array([is_likely_numeric(t) for t in texts])
        cx = np.where(numeric, lefts + widths - 1, lefts + widths / 2.0)
        # vectorized locate() with the clamp-to-last semantics of
        # _locate_clamped (searchsorted over the sorted bounds)
        cs = np.searchsorted(np.asarray(col_bounds), cx, side="right") - 1
        cs[(cs < 0) | (cs > ncols - 1)] = ncols - 1
        for i, t in enumerate(texts):
            c = cs[i]
            row[c] = t if row[c] == "" else row[c] + " " + t
        row = [v.strip() for v in row]
        if any(v for v in row):
            grid.append(row)

    normalize_numeric_like_columns(grid)

    row_bounds: list[float] = []
    for ln in lines:
        top_min = int(ln["top"].min())
        bot_max = int((ln["top"] + ln["height"]).max())
        row_bounds.append((top_min + bot_max) / 2.0)

    return Table(grid, col_bounds, row_bounds), headers_found
