"""PDF ingestion seam: binaryFile scan → decode backend → document model
→ extraction. The decode step itself is environment-gated (pypdfium2 is
absent here, like the reference's OcrTest assumeTrue pattern); everything
around it runs for real via FakePdfBackend."""

import json

import pytest

from pyspark.sql import functions as F

from extractpdf4j_spark.config import ExtractConfig
from extractpdf4j_spark.pdfio import (FakePdfBackend, Pypdfium2Backend,
                                      make_fake_pdf, read_pdf_corpus)
from extractpdf4j_spark.pipeline import extract


def _stmt_runs(rows, col_x, y0=700.0, dy=20.0):
    """Glyph runs for a simple statement table (points, bottom-left)."""
    runs = []
    for r, row in enumerate(rows):
        y = y0 - r * dy
        for c, tok in enumerate(row):
            runs.append([col_x[c], y, 8.0 * len(tok), 10.0, tok])
    return runs


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdfs")
    rows = [["date", "description", "debit", "credit", "balance"],
            ["01Jan", "coffee", "3.50", "", "96.50"],
            ["02Jan", "salary", "", "1,000.00", "1096.50"]]
    col_x = [40.0, 140.0, 320.0, 420.0, 520.0]
    (d / "digital-1.pdf").write_bytes(make_fake_pdf(
        [{"page": 1, "runs": _stmt_runs(rows, col_x)}]))
    # scanned page: raster + pre-OCR'd word layer for the embedded backend
    words = []
    for r, row in enumerate(rows):
        for c, tok in enumerate(row):
            if tok:
                words.append([int(col_x[c] * 4), 200 + r * 80,
                              len(tok) * 30, 40, 95, tok, 1, 1, r + 1, c + 1])
    (d / "scan-1.pdf").write_bytes(make_fake_pdf(
        [{"page": 1, "scan": {"width_px": 2550, "height_px": 3300,
                              "dpi": 300, "words": words}}]))
    # mixed doc: digital page 1 + scanned page 2
    (d / "mix-1.pdf").write_bytes(make_fake_pdf(
        [{"page": 1, "runs": _stmt_runs(rows, col_x)},
         {"page": 2, "scan": {"width_px": 2550, "height_px": 3300,
                              "dpi": 300, "words": words}}]))
    (d / "corrupt-1.pdf").write_bytes(b"%PDF-1.4 not really a fake pdf")
    (d / "empty-1.pdf").write_bytes(make_fake_pdf([]))
    return str(d)


def test_read_pdf_corpus_shapes(spark, pdf_dir):
    docs, media = read_pdf_corpus(spark, pdf_dir,
                                  backend_factory=FakePdfBackend)
    drows = {r["doc_id"]: r for r in docs.collect()}
    assert set(drows) == {"digital-1", "scan-1", "mix-1", "corrupt-1",
                          "empty-1"}
    # documents schema matches the pipeline contract
    assert [f.name for f in docs.schema["spans"].dataType.elementType.fields] \
        == ["kind", "text", "media_ref", "offset"]
    assert [s["kind"] for s in drows["mix-1"]["spans"]] == ["text", "media"]
    assert drows["empty-1"]["spans"] == []
    assert drows["corrupt-1"]["spans"][0]["text"] == "MALFORMED-PDF"
    mrows = {r["media_ref"]: r for r in media.collect()}
    assert set(mrows) == {"scan-1:p1", "mix-1:p2"}
    assert mrows["scan-1:p1"]["page"] == 1
    assert len(mrows["scan-1:p1"]["payload"]) > 0


def test_pdf_corpus_through_extraction(spark, pdf_dir):
    """The seam's output feeds extract() unchanged: digital page parses
    via stream, scanned page via OCR-capable strategies, corrupt PDF
    becomes an error row, empty PDF a no_tables row — full completeness."""
    docs, media = read_pdf_corpus(spark, pdf_dir,
                                  backend_factory=FakePdfBackend)
    out = {r["doc_id"]: r for r in
           extract(docs, media, ExtractConfig(), num_partitions=4).collect()}
    assert set(out) == {"digital-1", "scan-1", "mix-1", "corrupt-1",
                        "empty-1"}
    assert out["digital-1"]["status"] == "ok"
    assert out["scan-1"]["status"] == "ok"
    assert out["mix-1"]["status"] == "ok"
    assert out["corrupt-1"]["status"] == "error"
    assert out["empty-1"]["status"] == "no_tables"
    spans = json.loads(out["digital-1"]["spans_json"])
    assert spans[0]["kind"] == "media"
    assert any(s["text"] == "coffee" for s in spans)


def test_stage_dir_roundtrip(spark, pdf_dir, tmp_path):
    """Staged ingestion (decode-once at scale) produces identical docs."""
    stage = str(tmp_path / "stage")
    docs, media = read_pdf_corpus(spark, pdf_dir,
                                  backend_factory=FakePdfBackend,
                                  stage_dir=stage)
    assert docs.count() == 5
    assert media.count() == 2
    # stage is real parquet on disk
    assert spark.read.parquet(stage).count() > 0


def test_pypdfium2_backend_gated():
    """Mirrors the reference's OcrTest assumeTrue gating: the production
    backend either imports pypdfium2 or raises the documented seam error."""
    try:
        import pypdfium2  # noqa: F401
        has_lib = True
    except ImportError:
        has_lib = False
    if not has_lib:
        with pytest.raises(NotImplementedError, match="pypdfium2"):
            Pypdfium2Backend()
    else:  # pragma: no cover - not this sandbox
        b = Pypdfium2Backend()
        assert b.dpi == 300.0


def test_fake_backend_rejects_real_bytes():
    with pytest.raises(ValueError):
        FakePdfBackend().decode(b"%PDF-1.7 real pdf bytes")
