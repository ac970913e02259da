"""Structured Streaming surface + single-document library API."""

import json
import time

import pytest

from extractpdf4j_spark.config import ExtractConfig
from extractpdf4j_spark.fixtures import FixtureBuilder
from extractpdf4j_spark.pipeline import DOCUMENTS_SCHEMA, MEDIA_SCHEMA


def test_stream_extraction_available_now(spark, tmp_path):
    from extractpdf4j_spark.streaming import stream_extraction
    fb = FixtureBuilder(seed=42)
    fb.stmt_text("sd-1")
    fb.stmt_text("sd-2", n_rows=4)
    docs_pdf, media_pdf = fb.to_pandas()
    src = str(tmp_path / "incoming")
    spark.createDataFrame(docs_pdf, schema=DOCUMENTS_SCHEMA) \
        .write.parquet(src)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)

    q = stream_extraction(
        spark, src, media, ExtractConfig(),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True, num_partitions=2)
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out" / "combined"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"sd-1", "sd-2"}
    assert all(r["status"] == "ok" for r in rows.values())

    # second micro-batch: append two more docs, restart with same checkpoint
    fb2 = FixtureBuilder(seed=43)
    fb2.stmt_text("sd-3")
    docs2, _ = fb2.to_pandas()
    spark.createDataFrame(docs2, schema=DOCUMENTS_SCHEMA) \
        .write.mode("append").parquet(src)
    q2 = stream_extraction(
        spark, src, media, ExtractConfig(),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True, num_partitions=2)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(str(tmp_path / "out" / "combined"))
    got = out2.groupBy("doc_id").count().collect()
    # checkpoint means sd-1/sd-2 are NOT reprocessed
    assert {r["doc_id"]: r["count"] for r in got} == {
        "sd-1": 1, "sd-2": 1, "sd-3": 1}


def test_local_extract_document_matches_oracle():
    from extractpdf4j_spark.local import extract_document
    from extractpdf4j_spark.docmodel import decode_media_payload, decode_text_span
    from extractpdf4j_spark.ocr import EmbeddedWordsBackend
    import oracle

    fb = FixtureBuilder(seed=42).standard_corpus()
    docs_pdf, media_pdf = fb.to_pandas()
    payload_by_ref = dict(zip(media_pdf["media_ref"], media_pdf["payload"]))
    backend = EmbeddedWordsBackend()

    for t in docs_pdf.itertuples(index=False):
        out_spans, status, strategy, tables = extract_document(
            list(t.spans), payload_by_ref, ExtractConfig(), backend)
        # oracle comparison (same page decomposition)
        pages = {}
        for s in t.spans:
            if s["kind"] == "text":
                g = decode_text_span(s["text"])
                pages.setdefault(g.page, [None, None])[0] = g
            else:
                p = decode_media_payload(payload_by_ref[s["media_ref"]])
                pages.setdefault(p.page, [None, None])[1] = p
        page_list = [(pg, g, p) for pg, (g, p) in sorted(pages.items())]
        want_spans, want_status, want_strategy = oracle.oracle_hybrid_doc(
            page_list, backend)
        assert status == want_status, t.doc_id
        if status == "ok":
            assert strategy == want_strategy, t.doc_id
        assert out_spans == want_spans, t.doc_id


def test_local_extract_page_selection():
    from extractpdf4j_spark.local import extract_document
    fb = FixtureBuilder(seed=42)
    fb.stmt_text("d", n_rows=4, n_pages=3)
    doc = fb.documents[0]
    out, status, strategy, tables = extract_document(
        doc["spans"], {}, ExtractConfig(pages="2"))
    assert status == "ok"
    assert len(tables) == 1
    refs = [s["media_ref"] for s in out if s["kind"] == "media"]
    assert refs and all(r.startswith("table:stream:p2") for r in refs)
