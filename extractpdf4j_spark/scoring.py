"""Hybrid table scoring and strategy selection.

Anchored to HybridParser.java:

* ``score``       — 0.6*fill + 0.3*structure + 0.1*richness
                    (HybridParser.java:297-322); richness =
                    log(1+ncols)/log(4) so scores may slightly exceed 1.
* ``score_all``   — mean score over tables, 0.0 for empty
                    (HybridParser.java:275-282).
* ``pick_strategy`` — the EXACT argmax tie-break order
                    (HybridParser.java:257-263): lattice wins any tie it
                    participates in, then ocrstream, then stream.

Blankness uses Java ``String.isBlank`` semantics = all-whitespace.
"""

from __future__ import annotations

import math


from .table import Table

STRATEGY_STREAM = "stream"
STRATEGY_LATTICE = "lattice"
STRATEGY_OCRSTREAM = "ocrstream"


def _is_blank(v: str | None) -> bool:
    return v is None or v.strip() == ""


def score(t: Table) -> float:
    """Single-table score (HybridParser.java:297-322)."""
    rows, cols = t.nrows, t.ncols
    if rows == 0 or cols == 0:
        return 0.0
    total = rows * cols
    non_empty = 0
    multi_col_rows = 0
    for r in range(rows):
        row_ne = 0
        for c in range(cols):
            if not _is_blank(t.cell(r, c)):
                non_empty += 1
                row_ne += 1
        if row_ne > 1:
            multi_col_rows += 1
    fill = non_empty / total
    structure = multi_col_rows / rows
    richness = math.log(1 + cols) / math.log(4)
    return 0.6 * fill + 0.3 * structure + 0.1 * richness


def score_cells_vectorized(cells: list[list[str]]) -> float:
    """:func:`score` for a raw grid (list-of-lists). Plain comprehensions
    beat np.vectorize by ~100x on the small grids this sees per call."""
    if not cells or not cells[0]:
        return 0.0
    rows, cols = len(cells), len(cells[0])
    non_empty = 0
    multi = 0
    for row in cells:
        ne = sum(1 for v in row if v is not None and v.strip())
        non_empty += ne
        if ne > 1:
            multi += 1
    fill = non_empty / (rows * cols)
    structure = multi / rows
    richness = math.log(1 + cols) / math.log(4)
    return 0.6 * fill + 0.3 * structure + 0.1 * richness


def score_all(tables: list[Table]) -> float:
    """Average score; 0.0 when null/empty (HybridParser.java:275-282)."""
    if not tables:
        return 0.0
    return sum(score(t) for t in tables) / len(tables)


def pick_strategy(stream_score: float, lattice_score: float,
                  ocr_score: float) -> str:
    """Reference argmax with exact tie-break (HybridParser.java:257-263):

    ``lattice`` if lattice>=stream and lattice>=ocr; elif ``ocrstream`` if
    ocr>=stream and ocr>=lattice; else ``stream``.
    """
    if lattice_score >= stream_score and lattice_score >= ocr_score:
        return STRATEGY_LATTICE
    if ocr_score >= stream_score and ocr_score >= lattice_score:
        return STRATEGY_OCRSTREAM
    return STRATEGY_STREAM
