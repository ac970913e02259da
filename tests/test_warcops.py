"""WARC ingest tests — text-split parser semantics, the
Content-Length-strict binary walk (embedded magic, gzip members,
corrupt-record resync), and the documents adapter."""

import gzip
import os


def _rec(warc_type, body, uri=None, date=None):
    hdr = f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
    if uri:
        hdr += f"WARC-Target-URI: {uri}\r\n"
    if date:
        hdr += f"WARC-Date: {date}\r\n"
    hdr += f"Content-Length: {len(body.encode())}\r\n\r\n"
    return hdr + body + "\r\n\r\n"


def _resp(html, uri, status="200 OK"):
    return _rec("response",
                f"HTTP/1.1 {status}\r\nContent-Type: text/html\r\n\r\n"
                + html, uri=uri, date="2024-01-01T00:00:00Z")


def test_parse_warc_text_fields(spark):
    from extractpdf4j_spark.functions.warcops import parse_warc_text
    content = (_rec("warcinfo", "software: test")
               + _resp("<html><p>hello</p></html>", "https://a.example/x")
               + _resp("gone", "https://a.example/y", status="404 NF"))
    df = spark.createDataFrame([("f1", content)],
                               "file_id string, content string")
    rows = {r["record_idx"]: r for r in parse_warc_text(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["warc_type"] == "warcinfo"
    assert rows[1]["payload"] == "software: test"
    assert rows[1]["http_status"] == ""
    assert rows[2]["warc_type"] == "response"
    assert rows[2]["target_uri"] == "https://a.example/x"
    assert rows[2]["warc_date"] == "2024-01-01T00:00:00Z"
    assert rows[2]["http_status"] == "200"
    assert rows[2]["payload"] == "<html><p>hello</p></html>"
    assert rows[2]["content_length"] == len(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        "<html><p>hello</p></html>")
    assert rows[3]["http_status"] == "404"
    # record with no Content-Length header -> NULL, not a crash (ANSI)
    noclen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\nk: v\r\n\r\n")
    df2 = spark.createDataFrame([("f2", noclen)],
                                "file_id string, content string")
    r = parse_warc_text(df2).collect()[0]
    assert r["warc_type"] == "metadata" and r["content_length"] is None


def test_parse_warc_text_plan_is_pure_codegen(spark):
    """Scale evidence: the text parser is chained projections — no
    shuffle, no Python — so WARC files parse entirely inside their scan
    partition."""
    from extractpdf4j_spark.functions.warcops import parse_warc_text
    df = spark.createDataFrame([("f1", _resp("<p>x</p>", "https://e/x"))],
                               "file_id string, content string")
    plan = (parse_warc_text(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_read_warc_strict_framing_embedded_magic(spark, tmp_path):
    from extractpdf4j_spark.sources import read_warc
    # payload that CONTAINS the record magic — only the
    # Content-Length-strict walk can frame this correctly
    trap_body = "HTTP/1.1 200 OK\r\n\r\nx WARC/1.0\r\n y"
    trap = _rec("response", trap_body, uri="https://t.example/")
    tail = _resp("<p>after</p>", "https://t.example/2")
    (tmp_path / "a.warc").write_bytes((trap + tail).encode())
    rows = sorted(read_warc(spark, str(tmp_path)).collect(),
                  key=lambda r: r["target_uri"])
    assert len(rows) == 2
    assert rows[0]["payload_text"] == "x WARC/1.0\r\n y"
    assert rows[1]["payload_text"] == "<p>after</p>"


def test_read_warc_resyncs_past_corrupt_record(spark, tmp_path):
    from extractpdf4j_spark.sources import read_warc
    r1 = _resp("<p>one</p>", "https://g.example/1")
    r2 = _resp("<p>two</p>", "https://g.example/2")
    # corrupt middle record (Content-Length: garbage) must not lose
    # the record after it — the walk resyncs at the next magic
    bad = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "Content-Length: nonsense\r\n\r\nbody\r\n\r\n")
    (tmp_path / "bad.warc").write_bytes((r1 + bad + r2).encode())
    rows = sorted(read_warc(spark, str(tmp_path)).collect(),
                  key=lambda r: r["target_uri"])
    assert [r["payload_text"] for r in rows] == ["<p>one</p>",
                                                 "<p>two</p>"]


def test_warc_to_documents_feeds_html_front(spark):
    from extractpdf4j_spark.functions.warcops import (parse_warc_text,
                                                      warc_to_documents)
    ok = _resp("<html><body><p>real page content here with many many "
               "words in one block so the strong threshold keeps "
               "it</p></body></html>", "https://d.example/keep")
    nf = _resp("<p>gone</p>", "https://d.example/404", status="404 NF")
    info = _rec("warcinfo", "software: test")
    df = spark.createDataFrame([("f1", info + ok + nf)],
                               "file_id string, content string")
    docs = warc_to_documents(parse_warc_text(df)).collect()
    assert len(docs) == 1
    assert docs[0]["url"] == "https://d.example/keep"
    assert docs[0]["doc_id"] == "f1#2"
    # flows into the HTML main-content extractor unchanged
    from extractpdf4j_spark.functions.htmlops import extract_main_content
    d = spark.createDataFrame(
        [(docs[0]["doc_id"], docs[0]["text"])],
        "doc_id string, html string")
    main = extract_main_content(d, html_col="html").collect()
    assert len(main) == 1 and "real page content" in main[0]["main_text"]
