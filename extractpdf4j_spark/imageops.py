"""Pure-numpy image primitives for the lattice / ocrstream kernels.

The reference uses OpenCV (via bytedeco JavaCPP) for binarization,
morphology and projection profiling. This container has no OpenCV, and the
reference's per-pixel Java loops are exactly the kind of work numpy
reductions do well, so every primitive here is a vectorized numpy
re-implementation with the reference's constants:

* adaptive mean threshold 15/10 BINARY_INV  — ImagePdfUtils.java:95-99
* adaptive gaussian threshold 31/15 INV     — OcrStreamParser.java:124
* adaptive gaussian threshold 35/15 BINARY  — LatticeParser.java:213
* rect-kernel erode/dilate (morph open)     — LatticeParser.java:150-157,
                                              OcrStreamParser.java:215-231
* projection-profile line detection >35%    — LatticeParser.java:268-291
  (the O(W*H) Java pixel loop becomes one axis reduction)
* near-duplicate line dedupe (tol px)       — LatticeParser.java:297-307

Binary images use the OpenCV convention: uint8, 0 = background,
255 = foreground ("white" mask pixels).

All morphology here operates on binary masks, which lets us use windowed
*counts* (cumulative sums, O(N) independent of kernel size) instead of
sliding min/max: erode == "all k pixels in window set", dilate == "any
pixel in window set". Border behavior matches OpenCV defaults (erode pads
+inf ≙ set, dilate pads -inf ≙ unset).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Windowed sums (the building block)
# ---------------------------------------------------------------------------

def _window_count(mask01: np.ndarray, k: int, axis: int, pad_value: int) -> np.ndarray:
    """Count of set pixels in a length-k window along ``axis`` with OpenCV
    center anchor a=k//2 (window for output i covers [i-a, i+k-1-a]),
    padded with ``pad_value`` (0 or 1). O(N) independent of k.

    Uses uint16 cumulative sums with NATURAL OVERFLOW: the running total
    wraps mod 2^16, but window differences c[i+k]-c[i] computed in uint16
    arithmetic are exact because every true window sum (<= k <= 255) fits.
    Halving the accumulator width matters — at 32 cores these kernels are
    memory-bandwidth-bound, not compute-bound."""
    if k <= 1:
        return mask01.astype(np.uint16)
    assert k < 65536
    a = k // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (a + 1, k - 1 - a)   # +1 leading zero slot for the diff
    p = np.pad(mask01, pad, mode="constant", constant_values=pad_value)
    if pad_value:
        # the extra leading slot must be zero for the running sum diff
        if axis == 0:
            p[0, :] = 0
        else:
            p[:, 0] = 0
    c = np.cumsum(p, axis=axis, dtype=np.uint16)  # overflow-exact windows
    n = mask01.shape[axis]
    if axis == 0:
        return c[k:k + n, :] - c[0:n, :]
    return c[:, k:k + n] - c[:, 0:n]


def erode_binary(bin_img: np.ndarray, kw: int, kh: int) -> np.ndarray:
    """Erosion with a (kw x kh) rect kernel on a 0/255 binary image."""
    m = (bin_img > 0).astype(np.uint8)
    if kw > 1:
        m = (_window_count(m, kw, axis=1, pad_value=1) == kw).astype(np.uint8)
    if kh > 1:
        m = (_window_count(m, kh, axis=0, pad_value=1) == kh).astype(np.uint8)
    return m * np.uint8(255)


def dilate_binary(bin_img: np.ndarray, kw: int, kh: int) -> np.ndarray:
    """Dilation with a (kw x kh) rect kernel on a 0/255 binary image."""
    m = (bin_img > 0).astype(np.uint8)
    if kw > 1:
        m = (_window_count(m, kw, axis=1, pad_value=0) > 0).astype(np.uint8)
    if kh > 1:
        m = (_window_count(m, kh, axis=0, pad_value=0) > 0).astype(np.uint8)
    return m * np.uint8(255)


def morph_open_binary(bin_img: np.ndarray, kw: int, kh: int) -> np.ndarray:
    """MORPH_OPEN = erode then dilate with the same kernel."""
    return dilate_binary(erode_binary(bin_img, kw, kh), kw, kh)


# ---------------------------------------------------------------------------
# Adaptive thresholding
# ---------------------------------------------------------------------------

def _window_sum_u16(arr: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Exact length-k windowed sum along ``axis`` with replicate borders,
    via overflow-modular uint16 cumsum (valid while true window sums fit
    in 16 bits). Returns uint16, same shape as input."""
    a = k // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (a + 1, k - 1 - a)
    p = np.pad(arr, pad, mode="edge")
    if axis == 0:
        p[0, :] = 0
    else:
        p[:, 0] = 0
    c = np.cumsum(p, axis=axis, dtype=np.uint16)
    n = arr.shape[axis]
    if axis == 0:
        return c[k:k + n, :] - c[0:n, :]
    return c[:, k:k + n] - c[:, 0:n]


def _box_mean(gray: np.ndarray, block: int) -> np.ndarray:
    """Box-filter mean with replicate borders, rounded like OpenCV's
    boxFilter path inside adaptiveThreshold. Separable 16-bit windowed
    sums (block<=15 ⇒ row sums <=3825, 2-D sums <=57375 — both exact in
    uint16 via the overflow trick); floor(s/b²+0.5) = (2s+b²)//(2b²).
    Bandwidth, not FLOPs, bounds these kernels at high core counts."""
    assert block * block * 255 < 65536, "block too large for u16 scheme"
    s1 = _window_sum_u16(gray, block, axis=1)
    s = _window_sum_u16(s1, block, axis=0).astype(np.int32)
    b2 = block * block
    return (2 * s + b2) // (2 * b2)


def _gaussian_kernel(ksize: int) -> np.ndarray:
    """OpenCV getGaussianKernel weights for sigma<=0:
    sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    i = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return k / k.sum()


def _sep_filter(gray: np.ndarray, weights: np.ndarray, axis: int) -> np.ndarray:
    k = len(weights)
    a = k // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (a, k - 1 - a)
    p = np.pad(gray, pad, mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(p, k, axis=axis)
    return win @ weights


def _gaussian_mean(gray: np.ndarray, block: int) -> np.ndarray:
    # float32 halves the bandwidth of the two separable passes; the
    # result feeds a +/-15 threshold so sub-1e-3 rounding is immaterial
    w = _gaussian_kernel(block).astype(np.float32)
    g = _sep_filter(gray.astype(np.float32), w, axis=0)
    g = _sep_filter(g, w, axis=1)
    return np.floor(g + 0.5)


def adaptive_threshold(gray: np.ndarray, block: int, c: float,
                       method: str = "mean", invert: bool = True) -> np.ndarray:
    """OpenCV-style adaptiveThreshold with maxval=255.

    ``invert=True``  → THRESH_BINARY_INV: dst=255 where src <= T else 0
    ``invert=False`` → THRESH_BINARY:     dst=255 where src >  T else 0
    with T = localmean(block) - c.
    """
    if method == "mean" and float(c).is_integer():
        # fused integer compare: g <= floor((2s+b²)/(2b²)) - c  ⟺
        # (g+c)·2b² <= 2s+b² — skips the division and float temporaries
        s1 = _window_sum_u16(gray, block, axis=1)
        s = _window_sum_u16(s1, block, axis=0).astype(np.int32)
        b2 = block * block
        lhs = (gray.astype(np.int32) + int(c)) * (2 * b2)
        rhs = 2 * s + b2
        out = (lhs <= rhs) if invert else (lhs > rhs)
        return out.astype(np.uint8) * np.uint8(255)
    mean = _box_mean(gray, block) if method == "mean" else _gaussian_mean(gray, block)
    t = (mean - c).astype(np.int16)  # mean-c ∈ [-c, 255]; int16 halves traffic
    g = gray.astype(np.int16)
    out = (g <= t) if invert else (g > t)
    return out.astype(np.uint8) * np.uint8(255)


def _is_bilevel(gray: np.ndarray) -> bool:
    """True when every pixel is 0 or 255 (the packed-bits raster case).
    ``(g+1) & 0xFE`` is 0 exactly for g ∈ {0, 255} under uint8 wrap."""
    return not np.any((gray + np.uint8(1)) & np.uint8(0xFE))


def _win15_axis1_u8(z: np.ndarray) -> np.ndarray:
    """15-wide replicate-border window count along axis 1 of a 0/1 uint8
    mask, as two-level shift-adds (3+5 adds, all SIMD u8 — no cumsum
    dependency chain). Exact: counts <= 225 fit uint8."""
    h, n = z.shape
    p = np.empty((h, n + 14), dtype=np.uint8)   # manual replicate pad:
    p[:, 7:n + 7] = z                           # np.pad's generic path is
    p[:, :7] = z[:, :1]                         # a measured hot spot here
    p[:, n + 7:] = z[:, n - 1:n]
    s3 = p[:, 0:n + 12].copy()
    s3 += p[:, 1:n + 13]
    s3 += p[:, 2:n + 14]
    out = s3[:, 0:n].copy()
    for o in (3, 6, 9, 12):
        out += s3[:, o:n + o]
    return out


def _bilevel_mask01(gray: np.ndarray) -> np.ndarray:
    """``binarize_for_lines(gray) > 0`` as a 0/1 uint8 mask, for BILEVEL
    input only — bit-identical to the generic path, ~3x faster at 32
    cores (u8 shift-add window counts, axis-0 pass strip-tiled so every
    temporary stays cache-resident).

    Derivation: with pixels ∈ {0,255} the window sum is 255·cnt255, and
    the fused integer compare (g+10)·450 <= 2s+225 reduces to
    ``g==0 and cnt255>=9`` ⟺ ``g==0 and cnt0<=216`` (cnt0+cnt255=225
    under replicate borders)."""
    h, w = gray.shape
    z = (gray == 0).view(np.uint8)
    out = np.empty((h, w), dtype=np.uint8)
    s1 = _win15_axis1_u8(z)
    for y0 in range(0, h, 128):
        y1 = min(h, y0 + 128)
        lo, hi = max(0, y0 - 7), min(h, y1 + 7)
        seg = s1[lo:hi]
        tp, bp = 7 - (y0 - lo), 7 - (hi - y1)
        if tp or bp:
            padded = np.empty((hi - lo + tp + bp, w), dtype=np.uint8)
            padded[tp:tp + (hi - lo)] = seg
            padded[:tp] = seg[:1]
            padded[tp + (hi - lo):] = seg[-1:]
            seg = padded
        n = y1 - y0
        s3 = seg[0:n + 12, :].copy()
        s3 += seg[1:n + 13, :]
        s3 += seg[2:n + 14, :]
        s = s3[0:n, :].copy()
        for o in (3, 6, 9, 12):
            s += s3[o:n + o, :]
        out[y0:y1] = z[y0:y1] & (s <= 216)
    return out


def _binarize_region_rows(gray: np.ndarray, y0: int, y1: int) -> np.ndarray:
    """Rows [y0, y1) of ``binarize_for_lines(gray)`` — exact, including
    the replicate-border semantics relative to the FULL image."""
    block, c = 15, 10
    a = block // 2
    h, w = gray.shape
    lo = max(0, y0 - a)
    hi = min(h, y1 + (block - 1 - a))
    g = gray[lo:hi]
    top_pad = a - (y0 - lo)
    bot_pad = (block - 1 - a) - (hi - y1)
    if top_pad or bot_pad:
        g = np.pad(g, ((top_pad, bot_pad), (0, 0)), mode="edge")
    s1 = _window_sum_u16(g, block, axis=1)          # horizontal window sums
    zero = np.zeros((1, w), dtype=np.uint16)
    c2 = np.cumsum(np.vstack([zero, s1]), axis=0, dtype=np.uint16)
    n = y1 - y0
    b2 = block * block
    s = (c2[block:block + n] - c2[0:n]).astype(np.int32)
    lhs = (gray[y0:y1].astype(np.int32) + c) * (2 * b2)
    return np.where(lhs <= 2 * s + b2, 255, 0).astype(np.uint8)


def binarize_for_lines(gray: np.ndarray) -> np.ndarray:
    """ImagePdfUtils.binarizeForLines (ImagePdfUtils.java:95-99):
    adaptive MEAN_C, BINARY_INV, block=15, C=10.

    Strip-tiled so every temporary stays cache-resident: at 32 cores the
    full-image u16/int32 temporaries of the generic path double the
    per-page CPU through DRAM contention (measured 248→503 kernel-CPU
    seconds on the bench corpus). Bit-identical to
    ``adaptive_threshold(gray, 15, 10, 'mean', invert=True)``."""
    h, w = gray.shape
    if h == 0 or w == 0:
        return np.zeros((h, w), dtype=np.uint8)
    if _is_bilevel(gray):
        return _bilevel_mask01(gray) * np.uint8(255)
    out = np.empty((h, w), dtype=np.uint8)
    for y0 in range(0, h, 128):
        y1 = min(h, y0 + 128)
        out[y0:y1] = _binarize_region_rows(gray, y0, y1)
    return out


def _open_count_rows(sub01: np.ndarray, k: int) -> np.ndarray:
    """Per-row set-pixel count after a 1-D opening of width k (the
    erode+dilate pair with OpenCV border semantics)."""
    er = (_window_count(sub01, k, axis=1, pad_value=1) == k).astype(np.uint8)
    op = _window_count(er, k, axis=1, pad_value=0) > 0
    return op.sum(axis=1)


def detect_line_positions(gray: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Fused binarize → morphological-open → projection for BOTH axes,
    without ever materializing the full binarized image.

    Pass A streams binarize strips accumulating raw per-row/per-column
    coverage; passes B/C re-binarize only the candidate rows/columns
    (opening removes pixels, so sub-35% raw coverage can never pass) and
    apply the exact 1-D opening there. Bit-identical to
    ``project_open_lines(binarize_for_lines(gray), k, ...)`` for both
    axes — pinned by tests against the literal oracle."""
    h, w = gray.shape
    if _is_bilevel(gray):
        # packed-bits rasters: one u8 shift-add binarize materializes the
        # whole (small) mask, then both axes open candidate slices of it
        # — no per-strip or per-slab re-binarization at all
        m01 = _bilevel_mask01(gray)
        row_cov = m01.sum(axis=1, dtype=np.int64)
        col_cov = m01.sum(axis=0, dtype=np.int64)
        rows_out = np.empty(0, dtype=np.int64)
        cand_r = np.where(row_cov > w * 0.35)[0]
        if len(cand_r):
            keep = _open_count_rows(m01[cand_r], k) > w * 0.35
            rows_out = cand_r[keep]
        cols_out = np.empty(0, dtype=np.int64)
        cand_c = np.where(col_cov > h * 0.35)[0]
        if len(cand_c):
            sub = np.ascontiguousarray(m01[:, cand_c].T)
            keep = _open_count_rows(sub, k) > h * 0.35
            cols_out = cand_c[keep]
        return rows_out, cols_out

    row_cov = np.empty(h, dtype=np.int64)
    col_cov = np.zeros(w, dtype=np.int64)
    for y0 in range(0, h, 128):
        y1 = min(h, y0 + 128)
        bw = _binarize_region_rows(gray, y0, y1)
        m = bw > 0
        row_cov[y0:y1] = m.sum(axis=1)
        col_cov += m.sum(axis=0)

    rows_out = np.empty(0, dtype=np.int64)
    cand_r = np.where(row_cov > w * 0.35)[0]
    if len(cand_r):
        # contiguous candidate runs re-binarize as one slab each
        subs = []
        start = 0
        for i in range(1, len(cand_r) + 1):
            if i == len(cand_r) or cand_r[i] != cand_r[i - 1] + 1:
                r0, r1 = int(cand_r[start]), int(cand_r[i - 1]) + 1
                subs.append(((_binarize_region_rows(gray, r0, r1) > 0)
                             .astype(np.uint8)))
                start = i
        sub = np.vstack(subs)
        keep = _open_count_rows(sub, k) > w * 0.35
        rows_out = cand_r[keep]

    cols_out = np.empty(0, dtype=np.int64)
    cand_c = np.where(col_cov > h * 0.35)[0]
    if len(cand_c):
        # column slab = row slab of a transposed NARROW slice (15x15 box
        # mean and the pixelwise threshold are symmetric); only the ±7
        # neighbor columns are copied, never the whole image
        a = 7  # block 15 // 2
        subs = []
        start = 0
        for i in range(1, len(cand_c) + 1):
            if i == len(cand_c) or cand_c[i] != cand_c[i - 1] + 1:
                c0, c1 = int(cand_c[start]), int(cand_c[i - 1]) + 1
                s0 = max(0, c0 - a)
                slab_t = np.ascontiguousarray(gray[:, s0:min(w, c1 + a)].T)
                subs.append(((_binarize_region_rows(slab_t, c0 - s0,
                                                    c1 - s0) > 0)
                             .astype(np.uint8)))
                start = i
        sub = np.vstack(subs)
        keep = _open_count_rows(sub, k) > h * 0.35
        cols_out = cand_c[keep]
    return rows_out, cols_out


# ---------------------------------------------------------------------------
# Line projection / dedupe (lattice)
# ---------------------------------------------------------------------------

def project_open_lines(bin_img: np.ndarray, k: int, horizontal: bool) -> np.ndarray:
    """Fused morphological-open + projection line detector.

    Semantically identical to ``erode+dilate with a (k,1)/(1,k) kernel
    then project_lines`` (LatticeParser.java:150-161,268-291), but
    exploits two exact properties: a 1-D opening along an axis touches no
    other rows/columns, and opening only REMOVES pixels — so any line
    whose raw coverage is already below 35% can never pass. We therefore
    open only the candidate rows/columns (usually a handful), collapsing
    the full-image morphology to O(candidates * length)."""
    m = bin_img > 0
    if horizontal:
        cov = m.sum(axis=1)
        cand = np.where(cov > bin_img.shape[1] * 0.35)[0]
        if len(cand) == 0:
            return cand
        sub = m[cand].astype(np.uint8)
        er = (_window_count(sub, k, axis=1, pad_value=1) == k).astype(np.uint8)
        op = _window_count(er, k, axis=1, pad_value=0) > 0
        keep = op.sum(axis=1) > bin_img.shape[1] * 0.35
        return cand[keep]
    cov = m.sum(axis=0)
    cand = np.where(cov > bin_img.shape[0] * 0.35)[0]
    if len(cand) == 0:
        return cand
    sub = np.ascontiguousarray(m[:, cand].T).astype(np.uint8)
    er = (_window_count(sub, k, axis=1, pad_value=1) == k).astype(np.uint8)
    op = _window_count(er, k, axis=1, pad_value=0) > 0
    keep = op.sum(axis=1) > bin_img.shape[0] * 0.35
    return cand[keep]


def project_lines(bin_img: np.ndarray, horizontal: bool) -> np.ndarray:
    """Positions whose white-pixel coverage exceeds 35%
    (LatticeParser.java:268-291: strict ``sum > len*0.35``).

    The reference's O(W*H) per-pixel Java loop is one vectorized
    reduction here."""
    m = bin_img > 0
    if horizontal:
        cov = m.sum(axis=1)
        return np.where(cov > bin_img.shape[1] * 0.35)[0]
    cov = m.sum(axis=0)
    return np.where(cov > bin_img.shape[0] * 0.35)[0]


def dedupe_positions(xs: np.ndarray, tol: int) -> list[int]:
    """Sort then drop neighbors within tol (LatticeParser.java:297-307:
    keep v when |v-last| > tol)."""
    if len(xs) == 0:
        return []
    xs = np.sort(np.asarray(xs))
    out = [int(xs[0])]
    last = int(xs[0])
    for v in xs[1:]:
        v = int(v)
        if abs(v - last) > tol:
            out.append(v)
            last = v
    return out


def remove_rules(bin_inv: np.ndarray) -> np.ndarray:
    """OcrStreamParser.removeRules (OcrStreamParser.java:215-231):
    open with (max(w/30,35),1) and (1,max(h/24,30)) kernels, OR the rule
    masks, subtract from the text mask (binary ⇒ AND NOT)."""
    h, w = bin_inv.shape
    h_kw = max(w // 30, 35)
    v_kh = max(h // 24, 30)
    h_lines = morph_open_binary(bin_inv, h_kw, 1)
    v_lines = morph_open_binary(bin_inv, 1, v_kh)
    rules = (h_lines > 0) | (v_lines > 0)
    no_lines = (bin_inv > 0) & ~rules
    return no_lines.astype(np.uint8) * np.uint8(255)


def resize2x(gray: np.ndarray) -> np.ndarray:
    """2x upscale used before per-cell OCR (LatticeParser.java:211,
    INTER_CUBIC there). Pixel-exact cubic interpolation is irrelevant to
    extraction semantics (only the OCR engine sees the pixels), so this
    uses bilinear 2x which preserves the geometry contract."""
    h, w = gray.shape
    g = gray.astype(np.float64)
    # interleave rows/cols with midpoint averages
    rows = np.empty((2 * h, w), dtype=np.float64)
    rows[0::2] = g
    rows[1::2] = np.vstack([(g[:-1] + g[1:]) / 2.0, g[-1:]])
    out = np.empty((2 * h, 2 * w), dtype=np.float64)
    out[:, 0::2] = rows
    out[:, 1::2] = np.hstack([(rows[:, :-1] + rows[:, 1:]) / 2.0, rows[:, -1:]])
    return np.floor(out + 0.5).astype(np.uint8)
