"""Stream strategy: text-position clustering, fully vectorized.

Re-expresses StreamParser.java as numpy array programs over a page's glyph
runs. Steps and anchors:

1. Y-bucket row clustering, bucket = round(y/2.0), rows iterated in
   DESCENDING bucket order                      — StreamParser.java:119-125
   (Java ``Math.round`` on double is floor(x+0.5) — numpy's banker's
   rounding would diverge, so we use floor(y/2+0.5))
2. in-row stable X sort                          — StreamParser.java:128-130
3. span merge: break when gap ``x - lastRight > 6.0``; span x = first
   glyph x; text = concatenated tokens, trimmed — StreamParser.java:190-208
   (vectorized: gap array + cumsum of break flags)
4. column bounds from persistent gaps: adjacent-glyph gap > 12.0 votes
   bucket round((right+gap/2)/10); bounds = [0, k*10..., 1e9] with voted
   buckets sorted ascending                      — StreamParser.java:164-184
5. cell assignment findCol: interval search clamped to the LAST column
   when x is outside every interval              — StreamParser.java:154-158
   (np.searchsorted replaces the linear scan)
6. multi-span cells concatenated with " " via the exact
   ``prev.isEmpty() ? sp : prev+" "+sp`` fold    — StreamParser.java:135-145
7. row bounds = mean glyph y per row             — StreamParser.java:146-147

A glyph "run" (token with a start x, uniform metrics) is the atomic unit:
within-run character gaps are zero in our document model, so run-level and
char-level processing are equivalent for every threshold above.
"""

from __future__ import annotations

import numpy as np

from ..table import Table

Y_TOL = 2.0          # StreamParser.java:120
SPAN_GAP = 6.0       # StreamParser.java:197
BOUND_GAP = 12.0     # StreamParser.java:171
BOUND_BIN = 10.0     # StreamParser.java:172


def java_round(a: np.ndarray) -> np.ndarray:
    """Java Math.round(double) = floor(x + 0.5), as int64."""
    return np.floor(a + 0.5).astype(np.int64)


def stream_extract_page(x: np.ndarray, y: np.ndarray, w: np.ndarray,
                        tokens: np.ndarray, strip_text: bool = True,
                        columns: tuple[float, ...] = (),
                        table_areas: tuple = ()) -> Table:
    """Extract one page's table from glyph-run arrays.

    ``columns``/``table_areas`` implement the reference's documented-only
    features (docs/advanced-usage/columns.md, table-areas.md — no Java
    implementation exists): explicit column boundaries replace the gap
    histogram, and table areas confine the glyphs to given (x1,y1,x2,y2)
    regions (points, origin bottom-left) before parsing."""
    if table_areas:
        keep = np.zeros(len(x), dtype=bool)
        for (x1, y1, x2, y2) in table_areas:
            keep |= (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)
        x, y, w, tokens = x[keep], y[keep], w[keep], tokens[keep]
    n = len(x)
    if n == 0:
        return Table([], [0.0, 1e9], [])

    # 1-2) row clustering + in-row sort. Order = (bucket desc, x asc,
    # input-sequence asc) — one stable lexsort replaces TreeMap+list sort.
    bucket = java_round(y / Y_TOL)
    seq = np.arange(n)
    order = np.lexsort((seq, x, -bucket))
    xs, ys, ws = x[order], y[order], w[order]
    toks = tokens[order]
    bks = bucket[order]

    # row ids in emitted (descending-bucket) order
    row_start = np.empty(len(bks), dtype=bool)
    row_start[0] = True
    row_start[1:] = bks[1:] != bks[:-1]
    row_id = np.cumsum(row_start) - 1
    nrows = row_id[-1] + 1

    # 4) column bounds: explicit user columns, else gap-histogram
    # inference over adjacent glyphs WITHIN each row
    right = xs + ws
    gap = xs[1:] - right[:-1]
    same_row = row_id[1:] == row_id[:-1]
    if columns:
        bounds = np.concatenate(([0.0], np.sort(np.asarray(columns,
                                                           dtype=np.float64)),
                                 [1e9]))
    else:
        vote_mask = same_row & (gap > BOUND_GAP)
        if vote_mask.any():
            mid = right[:-1][vote_mask] + gap[vote_mask] / 2.0
            keys = np.unique(java_round(mid / BOUND_BIN))
            bounds = np.concatenate(([0.0], keys * BOUND_BIN, [1e9]))
        else:
            bounds = np.array([0.0, 1e9])
    ncols = len(bounds) - 1

    # 3) span merge: break at row change or in-row gap > 6.0
    brk = np.empty(len(xs), dtype=bool)
    brk[0] = True
    brk[1:] = (~same_row) | (gap > SPAN_GAP)
    span_id = np.cumsum(brk) - 1
    span_first = np.where(brk)[0]
    span_x = xs[span_first]
    span_row = row_id[span_first]
    # concatenate tokens per span (no separator), then trim
    # (StreamParser.java:198 sb.toString().trim()) — spans are contiguous
    # index ranges, so join slices directly instead of appending per glyph
    span_edges = np.append(span_first, len(toks))
    span_text = np.array(
        ["".join(toks[a:b]).strip()
         for a, b in zip(span_edges[:-1], span_edges[1:])],
        dtype=object)

    # 5) cell assignment with findCol clamp-to-last semantics
    col = np.searchsorted(bounds, span_x, side="right") - 1
    col[(col < 0) | (col > ncols - 1)] = ncols - 1

    # 6) grid build with the exact empty-aware " " join, spans in order
    grid = [["" for _ in range(ncols)] for _ in range(nrows)]
    for s in range(len(span_first)):
        r, c, t = span_row[s], col[s], span_text[s]
        prev = grid[r][c]
        grid[r][c] = t if prev == "" else prev + " " + t
    if strip_text:
        for r in range(nrows):
            grid[r] = [v.strip() for v in grid[r]]

    # 7) row bounds = mean y per row (emitted order)
    sums = np.bincount(row_id, weights=ys, minlength=nrows)
    counts = np.bincount(row_id, minlength=nrows)
    row_bounds = (sums / counts).tolist()

    return Table(grid, bounds.tolist(), row_bounds)
