"""Single-document library API (no Spark required).

The reference's library quickstart is one PDF in, tables out
(``new HybridParser(path).pages("all").parse()``, README.md:82-95). The
Spark engine's equivalent for a single interleaved document runs the same
kernels in-process — useful for debugging, notebooks, and the service-style
one-document call the reference's HTTP endpoint served
(PdfExtractController.java:30-57).
"""

from __future__ import annotations

from .config import ExtractConfig, MODE_LATTICE, MODE_OCRSTREAM, MODE_STREAM
from .docmodel import (GlyphRuns, PagePayload, decode_media_payload,
                       decode_text_span, serialize_tables)
from .kernels.lattice import lattice_extract_page
from .kernels.ocrstream import ocrstream_extract_page
from .kernels.stream import stream_extract_page
from .ocr import OcrBackend, default_backend
from .pagerange import is_all, parse_pages
from .scoring import pick_strategy, score_cells_vectorized
from .table import Table


def extract_document(spans: list[dict],
                     media_payloads: dict[str, bytes] | None = None,
                     cfg: ExtractConfig = ExtractConfig(),
                     backend: OcrBackend | None = None):
    """Extract one interleaved document. Returns (output_spans, status,
    strategy, tables) with the same semantics as the Spark pipeline's
    per-document result."""
    backend = backend or default_backend(cfg.tess_lang, cfg.tess_oem)
    media_payloads = media_payloads or {}

    pages: dict[int, list] = {}
    for s in spans:
        if s["kind"] == "text":
            g = decode_text_span(s["text"])
            pages.setdefault(g.page, [None, None])[0] = g
        elif s["kind"] == "media" and s["media_ref"] in media_payloads:
            p = decode_media_payload(media_payloads[s["media_ref"]])
            pages.setdefault(p.page, [None, None])[1] = p

    selected = parse_pages(cfg.pages)
    page_nos = sorted(pages)
    if not is_all(selected):
        page_nos = [p for p in page_nos if p in selected]

    per: dict[str, list[tuple[int, Table]]] = {s: [] for s in cfg.strategies()}
    headers_found = False
    for page_no in page_nos:
        g, payload = pages[page_no]
        for strat in cfg.strategies():
            if strat == MODE_STREAM:
                t = (stream_extract_page(g.x, g.y, g.w, g.tokens,
                                         cfg.strip_text, cfg.columns,
                                         cfg.table_areas)
                     if g is not None else Table([], [], []))
            elif strat == MODE_LATTICE:
                t, _ = lattice_extract_page(payload, g, backend,
                                            cfg.min_cell_w, cfg.min_cell_h)
            else:
                t, found = ocrstream_extract_page(payload, backend,
                                                  cfg.required_headers,
                                                  psm=cfg.tess_psm)
                headers_found = headers_found or found
            if t.nrows > 0:
                per[strat].append((page_no, t))

    if cfg.required_headers and MODE_OCRSTREAM in per and not headers_found:
        per[MODE_OCRSTREAM] = []  # OcrStreamParser.java:107-112

    scores = {s: (sum(score_cells_vectorized(t.cells) for _, t in v) / len(v)
                  if v else 0.0) for s, v in per.items()}
    if all(not v for v in per.values()):
        # mirror the pipeline's status branch (pipeline.py _assemble_one):
        # an ocrstream-only job whose required headers never appeared is
        # 'headers_missing', not 'no_tables'
        if (cfg.required_headers and not headers_found
                and cfg.strategies() == (MODE_OCRSTREAM,)):
            return [], "headers_missing", "", []
        return [], "no_tables", "", []
    if len(cfg.strategies()) > 1:
        winner = pick_strategy(scores.get(MODE_STREAM, 0.0),
                               scores.get(MODE_LATTICE, 0.0),
                               scores.get(MODE_OCRSTREAM, 0.0))
    else:
        winner = cfg.strategies()[0]
    if max(scores.values()) < cfg.min_score:
        return [], "below_min_score", winner, []
    tables = per[winner]
    out = serialize_tables([(p, winner, t) for p, t in tables])
    return out, "ok", winner, [t for _, t in tables]
