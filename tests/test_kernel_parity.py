"""Kernel ↔ oracle parity: the vectorized engine must match the scalar
transliteration of the reference semantics on every fixture family
(span-sequence equality surface, FIXTURES.md §2)."""

import numpy as np
import pytest

from extractpdf4j_spark.docmodel import (decode_media_payload,
                                         decode_text_span)
from extractpdf4j_spark.fixtures import FixtureBuilder
from extractpdf4j_spark.kernels.lattice import lattice_extract_page
from extractpdf4j_spark.kernels.ocrstream import ocrstream_extract_page
from extractpdf4j_spark.kernels.stream import stream_extract_page
from extractpdf4j_spark.ocr import EmbeddedWordsBackend
from extractpdf4j_spark.scoring import score_cells_vectorized, pick_strategy
from extractpdf4j_spark.table import Table

import oracle


BACKEND = EmbeddedWordsBackend()


def corpus_pages():
    """Decode the standard fixture corpus into per-doc page inputs."""
    fb = FixtureBuilder(seed=42).standard_corpus()
    docs, media = fb.to_pandas()
    payloads = {m: decode_media_payload(p)
                for m, p in zip(media["media_ref"], media["payload"])}
    out = {}
    for t in docs.itertuples(index=False):
        pages = {}
        for s in t.spans:
            if s["kind"] == "text":
                g = decode_text_span(s["text"])
                pages.setdefault(g.page, [None, None])[0] = g
            else:
                p = payloads[s["media_ref"]]
                pages.setdefault(p.page, [None, None])[1] = p
        out[t.doc_id] = sorted((pg, g, p) for pg, (g, p) in pages.items())
    return out


CORPUS = corpus_pages()
DOC_IDS = sorted(CORPUS.keys())


def assert_tables_equal(a: Table, b: Table, ctx: str):
    assert a.cells == b.cells, f"{ctx}: cells differ"
    assert a.col_bounds == pytest.approx(b.col_bounds), f"{ctx}: col_bounds"
    assert a.row_bounds == pytest.approx(b.row_bounds), f"{ctx}: row_bounds"


@pytest.mark.parametrize("doc_id", DOC_IDS)
def test_stream_parity(doc_id):
    for page, g, p in CORPUS[doc_id]:
        if g is None:
            continue
        got = stream_extract_page(g.x, g.y, g.w, g.tokens)
        want = oracle.oracle_stream_page(oracle.glyphs_from_runs(g))
        assert_tables_equal(got, want, f"{doc_id}/p{page}/stream")


@pytest.mark.parametrize("doc_id", DOC_IDS)
def test_lattice_parity(doc_id):
    for page, g, p in CORPUS[doc_id]:
        got, _ = lattice_extract_page(p, g, BACKEND)
        want = oracle.oracle_lattice_page(p, g, BACKEND)
        assert_tables_equal(got, want, f"{doc_id}/p{page}/lattice")


@pytest.mark.parametrize("doc_id", DOC_IDS)
def test_ocrstream_parity(doc_id):
    for page, g, p in CORPUS[doc_id]:
        got, got_f = ocrstream_extract_page(p, BACKEND)
        want, want_f = oracle.oracle_ocrstream_page(p, BACKEND)
        assert_tables_equal(got, want, f"{doc_id}/p{page}/ocrstream")
        assert got_f == want_f


def test_fixture_families_fire_their_paths():
    """Sanity: each family exercises the path it was designed for."""
    # stream: statement doc produces a multi-column table
    g = CORPUS["stmt-1"][0][1]
    t = stream_extract_page(g.x, g.y, g.w, g.tokens)
    assert t.nrows >= 8 and t.ncols >= 4

    # tight: 6.0 gap merges, 6.1 splits (StreamParser.java:197 strict >)
    g = CORPUS["tight-1"][0][1]
    t = stream_extract_page(g.x, g.y, g.w, g.tokens)
    flat = " | ".join(" ".join(r) for r in t.cells)
    assert "alphabeta" in flat          # 6.0 gap → same span, no space
    assert "alphabetagamma" not in flat  # 6.1 gap → split

    # lattice: ruled 5x4 grid + border closing margins → 7x6
    # (LatticeParser.java:163-167 prepends 0 / appends edge)
    page, g, p = CORPUS["ruled-1"][0]
    t, n_ocr = lattice_extract_page(p, g, BACKEND)
    assert (t.nrows, t.ncols) == (7, 6)
    assert n_ocr == 0
    # all interior cells carry text
    assert all(any(v for v in row) for row in t.cells[1:6])

    # sparse: OCR fallback fired; 15px column (< minCellW=20) skipped
    page, g, p = CORPUS["sparse-1"][0]
    t, n_ocr = lattice_extract_page(p, g, BACKEND)
    assert n_ocr > 0
    assert (t.nrows, t.ncols) == (6, 7)
    narrow = [row[5] for row in t.cells]  # the 600→615px column
    assert all(v == "" for v in narrow)

    # ocr_words: header-anchored bounds (5 cols), header row skipped
    page, g, p = CORPUS["ocrw-1"][0]
    t, _ = ocrstream_extract_page(p, BACKEND)
    assert t.ncols == 5
    assert all("Datc" not in " ".join(r) for r in t.cells)

    # ocr_headerless: fallback separator histogram produced >=2 columns
    page, g, p = CORPUS["ocrh-1"][0]
    t, _ = ocrstream_extract_page(p, BACKEND)
    assert t.ncols >= 2

    # ocr_amounts: numeric normalization applied to the whole debit
    # column (O→0), and the trailing-cents bug rewrote "d,dd" → ".dd"
    page, g, p = CORPUS["ocra-1"][0]
    t, _ = ocrstream_extract_page(p, BACKEND)
    debit = [row[2] for row in t.cells]
    assert any(d for d in debit)
    assert all("O" not in d for d in debit)
    credit = [row[3] for row in t.cells]
    assert any(c.startswith(".") for c in credit if c)


def test_hybrid_tie_prefers_lattice():
    """mixed_tie: stream and lattice score equal → lattice must win
    (HybridParser.java:257-263)."""
    pages = CORPUS["tie-1"]
    page, g, p = pages[0]
    st = stream_extract_page(g.x, g.y, g.w, g.tokens)
    lt, _ = lattice_extract_page(p, g, BACKEND)
    s_stream = score_cells_vectorized(st.cells)
    s_lattice = score_cells_vectorized(lt.cells)
    assert s_stream == pytest.approx(s_lattice)
    assert pick_strategy(s_stream, s_lattice, 0.0) == "lattice"


@pytest.mark.parametrize("doc_id", DOC_IDS)
def test_hybrid_doc_parity(doc_id):
    """Whole-document span-sequence equality vs the hybrid oracle."""
    spans, status, strategy = oracle.oracle_hybrid_doc(CORPUS[doc_id], BACKEND)
    # engine-side: same per-page kernels + selection
    from extractpdf4j_spark.docmodel import serialize_tables
    per = {"stream": [], "lattice": [], "ocrstream": []}
    for page, g, p in CORPUS[doc_id]:
        if g is not None:
            t = stream_extract_page(g.x, g.y, g.w, g.tokens)
            if t.nrows > 0:
                per["stream"].append((page, t))
        t, _ = lattice_extract_page(p, g, BACKEND)
        if t.nrows > 0:
            per["lattice"].append((page, t))
        t, _ = ocrstream_extract_page(p, BACKEND)
        if t.nrows > 0:
            per["ocrstream"].append((page, t))
    if all(not v for v in per.values()):
        assert status == "no_tables" and spans == []
        return
    scores = {k: (float(np.mean([score_cells_vectorized(t.cells)
                                 for _, t in v])) if v else 0.0)
              for k, v in per.items()}
    winner = pick_strategy(scores["stream"], scores["lattice"],
                           scores["ocrstream"])
    got = serialize_tables([(p, winner, t) for p, t in per[winner]])
    assert winner == strategy
    assert got == spans
