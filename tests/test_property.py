"""Property-based parity: on arbitrary glyph clouds and OCR word layouts,
the vectorized kernels must agree with the literal oracle transliteration
— this catches threshold/rounding/ordering divergences no fixture family
happens to hit."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from extractpdf4j_spark.kernels.stream import stream_extract_page
from extractpdf4j_spark.kernels.ocrstream import (group_lines,
                                                  header_anchored_bounds,
                                                  infer_separators)
from extractpdf4j_spark.table import Table

import oracle


coord = st.floats(min_value=0.0, max_value=900.0,
                  allow_nan=False, allow_infinity=False)
width = st.floats(min_value=0.1, max_value=60.0,
                  allow_nan=False, allow_infinity=False)
token = st.text(alphabet="abcXYZ019.$,- ", min_size=1, max_size=8)

glyph = st.tuples(token, coord, coord, width)


@settings(max_examples=60, deadline=None)
@given(st.lists(glyph, min_size=1, max_size=60))
def test_stream_kernel_matches_oracle_on_random_glyphs(glyphs):
    toks = np.array([g[0] for g in glyphs], dtype=object)
    x = np.array([g[1] for g in glyphs])
    y = np.array([g[2] for g in glyphs])
    w = np.array([g[3] for g in glyphs])
    got = stream_extract_page(x, y, w, toks)
    want = oracle.oracle_stream_page([(g[0], g[1], g[2], g[3])
                                      for g in glyphs])
    assert got.cells == want.cells
    assert np.allclose(got.col_bounds, want.col_bounds)
    assert np.allclose(got.row_bounds, want.row_bounds)


word_box = st.tuples(
    st.text(alphabet="abcdefgDQWE019.$,", min_size=1, max_size=10),
    st.integers(0, 800),    # left
    st.integers(0, 1000),   # top
    st.integers(1, 120),    # width
    st.integers(5, 40),     # height
    st.integers(1, 3),      # block
    st.integers(1, 2),      # par
    st.integers(1, 12),     # line
)


def _words_df(entries):
    return pd.DataFrame({
        "left": [e[1] for e in entries], "top": [e[2] for e in entries],
        "width": [e[3] for e in entries], "height": [e[4] for e in entries],
        "conf": [90] * len(entries), "text": [e[0] for e in entries],
        "block": [e[5] for e in entries], "par": [e[6] for e in entries],
        "line": [e[7] for e in entries],
        "word": list(range(1, len(entries) + 1)),
    })


@settings(max_examples=40, deadline=None)
@given(st.lists(word_box, min_size=1, max_size=40), st.integers(200, 900))
def test_separator_inference_matches_oracle(entries, page_width):
    df = _words_df(entries)
    lines_k = group_lines(df)
    lines_o = []
    groups = {}
    for w in df.to_dict("records"):
        groups.setdefault(f"{w['block']}:{w['par']}:{w['line']}", []).append(w)
    lines_o = sorted(groups.values(), key=lambda ln: min(w["top"] for w in ln))
    for ln in lines_o:
        ln.sort(key=lambda w: w["left"])

    got = infer_separators(lines_k, page_width)
    want = oracle._infer_separators(lines_o, page_width)
    assert got == want

    got_b = header_anchored_bounds(lines_k, page_width)
    want_b = oracle._header_anchored_bounds(lines_o, page_width)
    assert got_b == want_b


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="abZ 019.$,CRO", max_size=8),
                         min_size=3, max_size=3), min_size=1, max_size=10))
def test_column_normalization_matches_oracle(grid):
    from extractpdf4j_spark.textnorm import normalize_numeric_like_columns
    g1 = [list(r) for r in grid]
    g2 = [list(r) for r in grid]
    normalize_numeric_like_columns(g1)
    oracle._normalize_columns(g2)
    assert g1 == g2
