"""Unit tests for the URL curation family (functions/urlops.py) and the
composed fuzzy_dedup pass (functions/dedup.py) — hand-computed expected
values on tiny literal inputs; the corpus-scale hash gates live in
test_entry_queries.py (q_url_normalize / q_domain_curate /
q_dedup_fuzzy)."""

from pyspark.sql import functions as F


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"])


def test_normalize_rules(spark):
    from extractpdf4j_spark.functions.urlops import normalize_urls
    cases = {
        # scheme/host lowercase, www strip, default port drop, fragment
        "HTTP://WWW.Example.COM:80/a/b#frag": "http://example.com/a/b",
        # https default port; trailing slash; double slash collapse
        "https://site.org:443//x//y/": "https://site.org/x/y",
        # non-default port kept; empty path -> /
        "http://host.net:8080": "http://host.net:8080/",
        # tracking params dropped, rest sorted, empty params removed
        "http://h.io/p?utm_source=a&b=2&a=1&gclid=z": "http://h.io/p?a=1&b=2",
        # all params tracking -> no '?'
        "http://h.io/p?utm_campaign=x": "http://h.io/p",
    }
    out = {r["url"]: r["norm_url"]
           for r in normalize_urls(_urls(spark, list(cases))).collect()}
    assert out == cases


def test_registered_domain(spark):
    from extractpdf4j_spark.functions.urlops import normalize_urls
    cases = {
        "http://www.news.example.co.uk/a": "example.co.uk",   # 3-label
        "http://sub.deep.example.com/a": "example.com",       # 2-label
        "http://localhost/a": "localhost",                    # 1 label
        "http://www.example.io/a": "example.io",
    }
    out = {r["url"]: r["domain"]
           for r in normalize_urls(_urls(spark, list(cases))).collect()}
    assert out == cases


def test_url_dedup_and_blocklist_and_cap(spark):
    from extractpdf4j_spark.functions.urlops import (
        normalize_urls, url_dedup, filter_blocked_domains, domain_cap)
    urls = [
        "http://a.com/x",                  # 0
        "HTTP://WWW.A.com:80/x",           # 1 same after normalization
        "http://spam.net/y",               # 2 blocked
        "http://b.org/1", "http://b.org/2", "http://b.org/3",  # 3,4,5
    ]
    n = normalize_urls(_urls(spark, urls))
    kept = url_dedup(n)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2, 3, 4, 5]

    unblocked = filter_blocked_domains(kept, ["spam.net"])
    assert sorted(r["doc_id"] for r in unblocked.collect()) == [0, 3, 4, 5]

    capped = domain_cap(unblocked, cap=2)
    rows = capped.collect()
    per_dom = {}
    for r in rows:
        per_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert len(per_dom["b.org"]) == 2          # capped from 3
    assert per_dom["a.com"] == [0]
    assert all(r["sample_rank"] <= 2 for r in rows)


def _plan_of(df):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_normalize_urls_plan_is_pure_projection(spark):
    """100 TB shape: parse+normalize+registered-domain is a single
    codegen projection — zero exchanges; it runs inside the scan stage
    and downstream shuffles hash the already-normalized key."""
    from extractpdf4j_spark.functions.urlops import normalize_urls
    d = spark.range(0, 10).selectExpr(
        "id AS doc_id", "concat('http://h', id, '.com/p') AS url")
    plan = _plan_of(normalize_urls(d))
    assert "Exchange" not in plan, plan


def test_blocklist_plan_broadcasts(spark):
    """The domain blocklist joins as an explicit broadcast anti-join;
    the corpus side is never exchanged for the filter, even with
    auto-broadcast disabled."""
    from extractpdf4j_spark.functions.urlops import (normalize_urls,
                                                     filter_blocked_domains)
    d = normalize_urls(spark.range(0, 10).selectExpr(
        "id AS doc_id", "concat('http://h', id, '.com/p') AS url"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan_of(filter_blocked_domains(d, ["h1.com", "h2.com"]))
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_fuzzy_dedup_removes_near_dups_keeps_min_id(spark):
    from extractpdf4j_spark.functions.dedup import fuzzy_dedup
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    docs = [
        (10, base),
        (11, base + " extra"),                       # near-dup of 10
        (12, base.replace("green", "blue")),         # near-dup of 10
        (20, "completely different text about spark shuffles and "
             "partitions in a large distributed cluster environment"),
        (21, "another unrelated document mentioning parquet files and "
             "arrow batches moving between executors all day"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    kept = sorted(r["doc_id"]
                  for r in fuzzy_dedup(df, jaccard_threshold=0.5,
                                       max_bucket=None,
                                       num_partitions=4).collect())
    assert kept == [10, 20, 21]


def test_fuzzy_dedup_verification_blocks_lsh_false_positives(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from extractpdf4j_spark.functions.dedup import (
        fuzzy_dedup, minhash_signatures, lsh_candidate_pairs)
    # two unrelated docs CAN share an LSH band by chance; with a high
    # threshold the Jaccard verify must keep both. Use threshold just
    # above their true jaccard so any candidate pair is rejected.
    docs = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma completely different tail words here")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    kept = sorted(r["doc_id"]
                  for r in fuzzy_dedup(df, jaccard_threshold=0.9,
                                       max_bucket=None,
                                       num_partitions=4).collect())
    assert kept == [1, 2]


def test_remove_duplicate_ngrams_hand_computed(spark):
    """Cross-doc, intra-doc and case-preservation semantics on literal
    inputs (n=6): keeper is the global min (doc_id, pos) occurrence;
    every other occurrence's covered tokens are removed (interval
    union); matching is lowercased, rebuild keeps original case."""
    from extractpdf4j_spark.functions.dedup import remove_duplicate_ngrams
    docs = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e f q"),        # shares 6-gram at pos 2
        (3, "p q r s t u v p q r s t u v"),   # intra-doc repeat
        (4, "Hello World Foo Bar Baz Qux Quux"),
        (5, "hello world foo bar baz qux END"),  # case-insensitive match
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_ngrams(df, n=6).collect()}
    assert out[1]["text"] == "a b c d e f g h"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (8, 0)
    assert out[2]["text"] == "x y q"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (3, 6)
    # windows (3,0) and (3,1) keep; (3,7)/(3,8) drop tokens 7..13
    assert out[3]["text"] == "p q r s t u v"
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (7, 7)
    # doc 4 is the keeper (min id) and keeps ORIGINAL case
    assert out[4]["text"] == "Hello World Foo Bar Baz Qux Quux"
    assert out[5]["text"] == "END"
    assert (out[5]["n_kept"], out[5]["n_dropped"]) == (1, 6)


def test_remove_duplicate_ngrams_no_dups_is_identity(spark):
    from extractpdf4j_spark.functions.dedup import remove_duplicate_ngrams
    docs = [(1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_ngrams(df, n=6).collect()}
    assert out == {1: "alpha beta gamma delta epsilon zeta eta",
                   2: "one two three four five six seven"}


def test_fuzzy_dedup_against_corpus_two_stage(spark):
    """Corpus near-dups drop first; batch-internal clusters form only
    among the survivors; unique docs pass through."""
    from extractpdf4j_spark.functions.dedup import fuzzy_dedup_against_corpus
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    other = ("a completely different report about spark adaptive "
             "execution and shuffle partition coalescing behavior today")
    corpus = spark.createDataFrame([(100, base)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(1, base + " extra"),       # near-dup of corpus 100 -> dropped
         (2, other),                 # batch-internal keeper (min id)
         (3, other + " tail"),       # near-dup of 2 -> dropped
         (4, "totally unrelated text mentioning parquet files and "
             "arrow batches moving between executors all day")],
        ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in
                  fuzzy_dedup_against_corpus(
                      batch, corpus, jaccard_threshold=0.5,
                      max_bucket=None, num_partitions=4).collect())
    assert kept == [2, 4]


def _warc_record(headers: dict, block: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers.items())
    head += f"Content-Length: {len(block)}\r\n".encode()
    return head + b"\r\n" + block + b"\r\n\r\n"


def _sample_warc() -> bytes:
    info = _warc_record(
        {"WARC-Type": "warcinfo",
         "WARC-Record-ID": "<urn:uuid:info-1>",
         "WARC-Date": "2026-01-01T00:00:00Z",
         "Content-Type": "application/warc-fields"},
        b"software: testcrawler/1.0\r\n")
    html = (b"<html><head><title>T</title></head>"
            b"<body><p>Hello crawl world this paragraph carries enough "
            b"words to classify as main content today</p></body></html>")
    http_ok = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
               + html)
    r1 = _warc_record(
        {"WARC-Type": "response",
         "WARC-Record-ID": "<urn:uuid:resp-1>",
         "WARC-Target-URI": "HTTP://WWW.Example.COM:80/a//b/?b=2&a=1#f",
         "WARC-Date": "2026-01-01T00:00:01Z",
         "Content-Type": "application/http; msgtype=response"},
        http_ok)
    r2 = _warc_record(
        {"WARC-Type": "response",
         "WARC-Record-ID": "<urn:uuid:resp-2>",
         "WARC-Target-URI": "http://other.net/missing",
         "WARC-Date": "2026-01-01T00:00:02Z",
         "Content-Type": "application/http; msgtype=response"},
        b"HTTP/1.1 404 Not Found\r\n\r\ngone")
    return info + r1 + r2


def test_read_warc_plain_and_gzip(spark, tmp_path):
    """One row per WARC record; HTTP blocks split into status+payload;
    warcinfo passes through whole; the member-per-record gzip variant
    (what Common Crawl ships) parses identically."""
    import gzip as _gzip
    from extractpdf4j_spark.sources import read_warc
    raw = _sample_warc()
    (tmp_path / "a.warc").write_bytes(raw)
    # gzip each record as its own member, concatenated
    members = b"".join(_gzip.compress(m + b"\r\n\r\n")
                       for m in raw.split(b"\r\n\r\n") if m)
    (tmp_path / "gz").mkdir()
    (tmp_path / "gz" / "a.warc.gz").write_bytes(members)

    for src in (str(tmp_path / "a.warc"), str(tmp_path / "gz")):
        rows = {r["record_id"]: r
                for r in read_warc(spark, src).collect()}
        assert len(rows) == 3, src
        info = rows["<urn:uuid:info-1>"]
        assert info["warc_type"] == "warcinfo"
        assert info["http_status"] is None
        assert b"testcrawler" in bytes(info["payload"])
        ok = rows["<urn:uuid:resp-1>"]
        assert ok["http_status"] == 200
        assert ok["target_uri"].startswith("HTTP://WWW.Example.COM")
        assert ok["payload_text"].startswith("<html>")
        nf = rows["<urn:uuid:resp-2>"]
        assert nf["http_status"] == 404
        assert nf["payload_text"] == "gone"


def test_warc_feeds_curation_front(spark, tmp_path):
    """The emitted columns drive the JVM-side curation families
    directly: normalize_urls over target_uri, extract_main_content over
    payload_text — crawl archive to curated text without leaving the
    DataFrame API."""
    from extractpdf4j_spark.sources import read_warc
    from extractpdf4j_spark.functions.urlops import normalize_urls
    from extractpdf4j_spark.functions.htmlops import extract_main_content
    (tmp_path / "a.warc").write_bytes(_sample_warc())
    docs = (read_warc(spark, str(tmp_path / "a.warc"))
            .filter("warc_type = 'response' AND http_status = 200")
            .selectExpr("record_id AS doc_id",
                        "target_uri AS url",
                        "payload_text AS html"))
    urls = normalize_urls(docs).select("doc_id", "norm_url", "domain")
    main = extract_main_content(docs, html_col="html")
    row = urls.join(main, "doc_id").collect()[0]
    assert row["norm_url"] == "http://example.com/a/b?a=1&b=2"
    assert row["domain"] == "example.com"
    assert "Hello crawl world" in row["main_text"]


def test_anchor_corpus_pools_normalized_targets(spark):
    """extract_links -> anchor_corpus: variants of the same target URL
    (www, default port, tracking params) pool under one normalized key;
    relative links are dropped; anchors are sorted distinct non-empty."""
    from extractpdf4j_spark.functions.htmlops import extract_links
    from extractpdf4j_spark.functions.urlops import anchor_corpus
    docs = spark.createDataFrame([
        (1, '<p><a href="http://www.x.com/a/">Alpha</a> '
            '<a href="/rel">rel</a></p>'),
        (2, '<p><a href="http://x.com:80/a?utm_source=t">beta</a> '
            '<a href="http://x.com/a">Alpha</a></p>'),
        (3, '<p><a href="https://y.org/b"></a></p>'),
    ], "doc_id long, html string")
    got = {r["norm_url"]: r
           for r in anchor_corpus(extract_links(docs)).collect()}
    assert set(got) == {"http://x.com/a", "https://y.org/b"}
    a = got["http://x.com/a"]
    assert a["n_refs"] == 3 and a["n_sources"] == 2
    assert a["domain"] == "x.com"
    assert a["anchors"] == "Alpha | beta"
    b = got["https://y.org/b"]
    assert b["n_refs"] == 1 and b["anchors"] == ""


ROBOTS_A = "\n".join([
    "# crawl policy",
    "User-agent: FooBot",
    "User-agent: *",          # stacked UA lines share the group
    "Disallow: /shared",
    "",
    "User-agent: Googlebot",  # named group — not ours
    "Disallow: /",
    "Crawl-delay: 5",         # unknown field: ignored, doesn't split
    "",
    "User-agent: *",          # second * group merges with the first
    "Allow: /cat/ok",
    "DISALLOW: /cat",         # case-insensitive field name
    "Allow: /tie",
    "Disallow: /tie",         # same length -> allow wins
    "Allow:",                 # empty value: no-op
    "  Disallow: /ws  # pad", # surrounding ws + trailing comment
])
ROBOTS_B = "\n".join([
    "Disallow: /orphan",      # rule before any UA line: ignored
    "User-agent: OtherBot",
    "Disallow: /",
])


def test_parse_robots_groups_and_rules(spark):
    from extractpdf4j_spark.functions.urlops import parse_robots
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        ["host", "robots_txt"])
    rules = {(r["host"], r["rule"], r["prefix"])
             for r in parse_robots(robots).collect()}
    assert rules == {
        ("a.com", "disallow", "/shared"),
        ("a.com", "allow", "/cat/ok"),
        ("a.com", "disallow", "/cat"),
        ("a.com", "allow", "/tie"),
        ("a.com", "disallow", "/tie"),
        ("a.com", "disallow", "/ws"),
    }  # Googlebot group and b.com's rules never reach '*'


def test_robots_filter_longest_match_semantics(spark):
    from extractpdf4j_spark.functions.urlops import (parse_robots,
                                                     robots_filter)
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        ["host", "robots_txt"])
    cases = [
        ("https://a.com/cat/item1", 0, "/cat"),      # disallow match
        ("https://a.com/cat/ok/p", 1, "/cat/ok"),    # longer allow wins
        ("https://a.com/tie", 1, "/tie"),            # length tie -> allow
        ("https://a.com/shared/x", 0, "/shared"),    # merged first group
        ("https://a.com/free", 1, ""),               # no match -> allowed
        ("https://A.COM/ws?q=1", 0, "/ws"),          # host case; query in target
        ("https://b.com/orphan/x", 1, ""),           # orphan rule ignored
        ("https://c.com/anything", 1, ""),           # unknown host
    ]
    urls = _urls(spark, [u for u, _, _ in cases])
    out = {r["url"]: (r["allowed"], r["matched_prefix"])
           for r in robots_filter(urls, parse_robots(robots),
                                  broadcast_rules=True).collect()}
    assert out == {u: (a, p) for u, a, p in cases}


SITEMAP_XML = (
    '<?xml version="1.0"?>\n<urlset>\n'
    "<url><loc>https://s.com/a</loc>"
    "<lastmod>2026-01-15</lastmod><priority>0.8</priority></url>\n"
    "<url>\n  <loc>\n    https://s.com/b\n  </loc>\n</url>\n"   # padded loc
    "<url><lastmod>2026-02-01</lastmod></url>\n"                # no loc
    "<url><loc>https://s.com/c</loc><priority>junk</priority></url>\n"
    "</urlset>")


def test_parse_sitemaps_grammar(spark):
    from extractpdf4j_spark.functions.urlops import parse_sitemaps
    sm = spark.createDataFrame([("s.com", SITEMAP_XML)],
                               ["host", "sitemap_xml"])
    rows = {r["loc"]: r for r in parse_sitemaps(sm).collect()}
    # loc-less block dropped but still consumed position 2
    assert set(rows) == {"https://s.com/a", "https://s.com/b",
                         "https://s.com/c"}
    a = rows["https://s.com/a"]
    assert (a["si"], a["lastmod"], a["priority"]) == (0, "2026-01-15", 0.8)
    b = rows["https://s.com/b"]          # whitespace trimmed, no lastmod
    assert (b["si"], b["lastmod"], b["priority"]) == (1, "", None)
    c = rows["https://s.com/c"]          # junk priority -> NULL not crash
    assert (c["si"], c["priority"]) == (3, None)


def test_sitemap_staleness_statuses(spark):
    from extractpdf4j_spark.functions.urlops import (parse_sitemaps,
                                                     sitemap_staleness)
    sm = spark.createDataFrame([("s.com", SITEMAP_XML)],
                               ["host", "sitemap_xml"])
    crawled = spark.createDataFrame(
        [("https://s.com/a", "2026-01-10"),    # before lastmod -> stale
         ("https://s.com/b", "2026-01-10"),    # no lastmod -> fresh
         ("https://s.com/x", "2026-01-10")],   # not in sitemap -> unlisted
        ["url", "fetched_on"])                 # /c never fetched -> uncrawled
    out = {r["url"]: r["status"]
           for r in sitemap_staleness(parse_sitemaps(sm),
                                      crawled).collect()}
    assert out == {"https://s.com/a": "stale",
                   "https://s.com/b": "fresh",
                   "https://s.com/c": "uncrawled",
                   "https://s.com/x": "unlisted"}


def test_curate_web_provenance(spark):
    """Every row labeled with the FIRST rejecting stage; a disallowed
    row never claims the dedup keeper slot; the cap ranks survivors
    only."""
    from extractpdf4j_spark.functions.urlops import curate_web
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /no")],
        ["host", "robots_txt"])
    urls = [
        "http://a.com/no/1",           # 0 disallowed
        "http://a.com/no/1",           # 1 disallowed (NOT duplicate_url)
        "HTTP://WWW.A.com:80/x",       # 2 keeper for /x (robots-allowed)
        "http://a.com/x",              # 3 duplicate_url of 2
        "http://spam.net/y",           # 4 blocked_domain
        "http://b.org/1",              # 5 kept
        "http://b.org/2",              # 6 kept or over_cap (cap=1)
    ]
    out = {r["doc_id"]: r["status"]
           for r in curate_web(_urls(spark, urls), robots=robots,
                               blocked=["spam.net"], cap=1).collect()}
    assert out[0] == "disallowed" and out[1] == "disallowed"
    assert out[2] == "kept" and out[3] == "duplicate_url"
    assert out[4] == "blocked_domain"
    assert sorted([out[5], out[6]]) == ["kept", "over_cap"]
    assert len(out) == 7                       # provenance keeps all rows


def test_crawl_schedule_urgency_priority_budget(spark):
    """uncrawled beats stale regardless of priority; absent/negative
    priority takes the sitemaps.org default 0.5; per-host budget caps
    independently; fresh/unlisted rows are never scheduled."""
    from extractpdf4j_spark.functions.urlops import crawl_schedule
    rows = [
        ("h1", "u/a", "stale", 0.9),
        ("h1", "u/b", "uncrawled", None),     # default 0.5, still first
        ("h1", "u/c", "stale", 0.1),
        ("h1", "u/d", "fresh", 1.0),          # never scheduled
        ("h2", "u/e", "stale", -1.0),         # sentinel -> 0.5
        ("h2", "u/f", "stale", 0.4),
        ("h2", "u/g", "unlisted", None),
    ]
    df = spark.createDataFrame(rows,
                               "host string, url string, status string, "
                               "priority double")
    out = [(r["host"], r["url"], r["crawl_rank"], r["priority"])
           for r in crawl_schedule(df, per_host_budget=2)
           .orderBy("host", "crawl_rank").collect()]
    assert out == [("h1", "u/b", 1, 0.5),     # uncrawled first
                   ("h1", "u/a", 2, 0.9),     # then best stale; u/c cut
                   ("h2", "u/e", 1, 0.5),     # sentinel default beats 0.4
                   ("h2", "u/f", 2, 0.4)]


def test_curate_web_no_robots_no_cap(spark):
    from extractpdf4j_spark.functions.urlops import curate_web
    urls = ["http://a.com/x", "http://www.a.com/x", "http://b.org/y"]
    out = {r["doc_id"]: r["status"]
           for r in curate_web(_urls(spark, urls)).collect()}
    assert out == {0: "kept", 1: "duplicate_url", 2: "kept"}


# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_scalar(text, w=16, mask_bits=6, min_len=32, max_len=128):
    """Literal scalar replay of cdc_chunks' documented semantics."""
    import hashlib
    from extractpdf4j_spark.functions.dedup import cdc_powers
    P = cdc_powers(w)
    mask = (1 << mask_bits) - 1
    codes = [ord(ch) for ch in text]
    n = len(codes)
    cand = []
    for i in range(w, n + 1):          # 1-based cut position
        h = sum(codes[i - 1 - k] * P[k] for k in range(w)) % (1 << 32)
        if h & mask == 0:
            cand.append(i)
    chunks, s, ci = [], 0, 0
    while s < n:
        lo, hi = s + min_len, min(s + max_len, n)
        cut = next((i for i in cand if lo <= i <= hi), hi)
        chunks.append((ci, s, cut - s,
                       hashlib.md5(text[s:cut].encode()).hexdigest()))
        s, ci = cut, ci + 1
    return chunks


def test_cdc_chunks_matches_scalar_replay(spark):
    from extractpdf4j_spark.functions.dedup import cdc_chunks
    import random
    rng = random.Random(7)
    docs = []
    for i in range(8):
        words = ["w%d" % rng.randrange(50) for _ in range(rng.randrange(5, 120))]
        docs.append((i, " ".join(words)))
    docs.append((8, ""))        # empty -> no rows
    docs.append((9, None))      # null  -> no rows
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(d).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["length"], r["chunk_hash"]))
    for i, text in docs:
        exp = _cdc_scalar(text) if text else []
        assert sorted(got.get(i, [])) == exp, i
    # every doc fully covered, chunks contiguous, lengths within clamp
    for i, text in docs[:8]:
        ch = sorted(got[i])
        assert ch[0][1] == 0 and sum(c[2] for c in ch) == len(text)
        assert all(c[2] <= 128 for c in ch)
        assert all(c[2] >= 1 for c in ch)


def test_cdc_chunks_shift_invariant_shared_passage(spark):
    """THE CDC property: a long passage shared by two documents at
    different offsets produces identical chunk hashes once the rolling
    window resynchronizes — which is what makes groupBy(chunk_hash)
    find cross-document duplicated content."""
    from extractpdf4j_spark.functions.dedup import cdc_chunks
    import random
    rng = random.Random(13)
    passage = " ".join("p%d" % rng.randrange(40) for _ in range(400))
    pre_a = "short intro. "
    pre_b = "a considerably longer and different preamble text here. "
    d = spark.createDataFrame([(1, pre_a + passage), (2, pre_b + passage)],
                              "doc_id long, text string")
    rows = cdc_chunks(d).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    shared = h1 & h2
    # all chunks strictly inside the passage (after resync, before the
    # tail) must coincide; require a substantial overlap
    assert len(shared) >= max(len(h1), len(h2)) - 4, (len(h1), len(h2),
                                                      len(shared))
    with __import__("pytest").raises(ValueError):
        cdc_chunks(d, min_len=0)
    with __import__("pytest").raises(ValueError):
        cdc_chunks(d, w=1)


def test_cdc_duplicate_chunks_finds_shared_passage(spark):
    from extractpdf4j_spark.functions.dedup import (cdc_chunks,
                                                    cdc_duplicate_chunks)
    import random
    rng = random.Random(99)
    passage = " ".join("s%d" % rng.randrange(30) for _ in range(300))
    uniq = lambda i: " ".join("u%d_%d" % (i, k) for k in range(120))
    d = spark.createDataFrame(
        [(1, uniq(1) + " " + passage),
         (2, uniq(2) + " " + passage),
         (3, uniq(3))],
        "doc_id long, text string")
    rep = cdc_duplicate_chunks(d, min_docs=2).collect()
    assert rep, "shared passage must surface as duplicated chunks"
    for r in rep:
        assert r["n_docs"] >= 2
        assert r["keeper_id"] == 1          # min (id, start) keeper
        assert r["n_occurrences"] >= r["n_docs"]
    # keeper_start matches the keeper doc's own chunk at that hash
    ch1 = {r["chunk_hash"]: r["start"]
           for r in cdc_chunks(d).collect() if r["doc_id"] == 1}
    for r in rep:
        assert ch1[r["chunk_hash"]] == r["keeper_start"]


def test_cdc_dedup_rewrite_keeper_reconstructs_exactly(spark):
    from extractpdf4j_spark.functions.dedup import (cdc_chunks,
                                                    cdc_dedup_rewrite)
    import random
    rng = random.Random(21)
    passage = " ".join("s%d" % rng.randrange(30) for _ in range(300))
    uniq = lambda i: " ".join("u%d_%d" % (i, k) for k in range(120))
    t1, t2, t3 = (uniq(1) + " " + passage, uniq(2) + " " + passage,
                  uniq(3))
    d = spark.createDataFrame([(1, t1), (2, t2), (3, t3), (4, None)],
                              "doc_id long, text string")
    out = {r["doc_id"]: r for r in cdc_dedup_rewrite(d).collect()}
    assert len(out) == 4
    # keeper doc and the unique doc reconstruct EXACTLY
    assert out[1]["text"] == t1 and out[1]["n_chunks_dropped"] == 0
    assert out[3]["text"] == t3 and out[3]["n_chunks_dropped"] == 0
    assert out[4]["text"] == "" and out[4]["n_chunks_kept"] == 0
    # doc2 loses exactly its duplicated chunks; expected rebuilt text
    # derived from the manifest + the duplicated-hash set
    ch = [r for r in cdc_chunks(d).collect()]
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    hashes1 = {r["chunk_hash"] for r in by_doc[1]}
    exp2 = "".join(t2[r["start"]:r["start"] + r["length"]]
                   for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])
                   if r["chunk_hash"] not in hashes1)
    assert out[2]["text"] == exp2
    assert out[2]["n_chunks_dropped"] > 0
    assert out[2]["n_chunks_kept"] + out[2]["n_chunks_dropped"] == len(by_doc[2])
