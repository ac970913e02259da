"""Unit tests for functions/htmlops.py — hand-crafted HTML pages with
known block structure, boilerplate and nesting."""

from pyspark.sql import functions as F

PAGE = (
    "<html><head><title>t</title><style>p{x}</style>"
    "<script>var q='</div>';</script></head>"
    "<body><div><nav><a href='/'>home</a> <a href='/a'>about</a> "
    "<a href='/c'>contact</a></nav></div>"
    "<div><h1>big story</h1>"
    "<p>this is the first real paragraph of the article with many "
    "plain words in it</p>"
    "<p>short tail here</p></div>"
    "<div><footer>all rights reserved <a href='/p'>privacy</a> "
    "<a href='/t'>terms</a></footer></div></body></html>"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_html_blocks_segmentation_and_link_density(spark):
    from extractpdf4j_spark.functions.htmlops import html_blocks
    out = html_blocks(_df(spark, [(1, PAGE)])).orderBy("block_id").collect()
    texts = [r["text"] for r in out]
    # script content (containing a closing-tag string!) must not leak
    assert not any("var q" in t for t in texts)
    nav = out[0]
    assert nav["text"] == "t home about contact"
    assert nav["link_density"] > 0.33
    para = [r for r in out if r["text"].startswith("this is the first")][0]
    assert para["n_words"] == 15
    assert para["link_density"] == 0.0


def test_extract_main_content_keeps_article_drops_chrome(spark):
    from extractpdf4j_spark.functions.htmlops import extract_main_content
    out = extract_main_content(_df(spark, [(1, PAGE)])).collect()[0]
    assert out["main_text"] == (
        "this is the first real paragraph of the article with many "
        "plain words in it\nshort tail here")  # weak block rescued by neighbour
    assert out["n_blocks_kept"] == 2
    # nav, h1, footer counted but dropped
    assert out["n_blocks_total"] == 5
    assert out["n_chars_main"] == len(out["main_text"])


def test_extract_main_content_all_boilerplate_page(spark):
    from extractpdf4j_spark.functions.htmlops import extract_main_content
    page = ("<div><nav><a href='/'>one</a> <a href='/b'>two</a> "
            "<a href='/c'>three</a></nav></div>")
    out = extract_main_content(_df(spark, [(1, page)])).collect()[0]
    assert out["main_text"] == ""
    assert out["n_blocks_kept"] == 0
    assert out["n_blocks_total"] == 1


def test_entity_unescape_order(spark):
    from extractpdf4j_spark.functions.htmlops import html_blocks
    page = "<p>a &amp;lt; b &lt; c &amp; d</p>"
    out = html_blocks(_df(spark, [(1, page)])).collect()
    # &amp;lt; -> &lt; (single unescape), &lt; -> <, &amp; -> &
    assert out[0]["text"] == "a &lt; b < c & d"


def test_dom_stats_depth_and_counts(spark):
    from extractpdf4j_spark.functions.htmlops import dom_stats
    page = ("<div><div><p>x <a href='/'>y</a></p><br><img src='z'>"
            "</div></div><p>w</p>")
    out = dom_stats(_df(spark, [(1, page)])).collect()[0]
    # depth: div(1) div(2) p(3) a(4); br/img are void
    assert out["max_depth"] == 4
    assert out["n_links"] == 1
    assert out["n_paras"] == 2
    # open tags incl. void: div div p a br img p = 7
    assert out["n_tags"] == 7


def test_spanize_html_feeds_the_pipeline(spark):
    from extractpdf4j_spark.functions.htmlops import spanize_html
    from extractpdf4j_spark.pipeline import extract
    from extractpdf4j_spark.config import ExtractConfig
    docs = spanize_html(_df(spark, [(7, PAGE)]).select(
        F.col("doc_id").cast("string").alias("doc_id"), "html"))
    rows = docs.collect()
    assert len(rows) == 1
    spans = rows[0]["spans"]
    assert [s["kind"] for s in spans] == ["text", "text"]
    assert spans[0]["text"].startswith("this is the first")
    assert spans[1]["text"] == "short tail here"
    # and the pipeline accepts the adapter output end-to-end
    out = extract(docs, None, ExtractConfig()).collect()
    assert len(out) == 1 and out[0]["doc_id"] == "7"


def test_link_density_not_inflated_by_a_prefixed_tags(spark):
    from extractpdf4j_spark.functions.htmlops import html_blocks
    # <abbr>/<aside>-class tags must not count their text as link text
    page = ("<p>the <abbr title='x'>spec</abbr> covers many cases see "
            "the anchor <a href='/s'>here</a> for details today</p>")
    out = html_blocks(_df(spark, [(1, page)])).collect()[0]
    # only 'here' is link text
    assert out["link_density"] == round(4 / len(out["text"]), 6)


def test_uppercase_tags_handled(spark):
    from extractpdf4j_spark.functions.htmlops import html_blocks, dom_stats
    page = ("<SCRIPT>var secret=1;</SCRIPT><DIV><P>Upper case markup "
            "still parses fine</P></DIV>")
    blocks = html_blocks(_df(spark, [(1, page)])).collect()
    assert len(blocks) == 1  # </P> and </DIV> split; script stripped
    assert "secret" not in blocks[0]["text"]
    st = dom_stats(_df(spark, [(1, page)])).collect()[0]
    assert st["n_paras"] == 1 and st["n_tags"] == 2
    assert st["max_depth"] == 2


def test_no_visible_text_doc_survives(spark):
    from extractpdf4j_spark.functions.htmlops import (extract_main_content,
                                                      dom_stats)
    rows = [(1, "<script>x=1</script>"), (2, "plain text no markup"),
            (3, None)]
    main = {r["doc_id"]: r for r in
            extract_main_content(_df(spark, rows)).collect()}
    assert set(main) == {1, 2, 3}
    assert main[1]["main_text"] == "" and main[1]["n_blocks_total"] == 0
    assert main[3]["main_text"] == ""
    st = {r["doc_id"]: r for r in dom_stats(_df(spark, rows)).collect()}
    assert set(st) == {1, 2, 3}
    assert (st[2]["n_tags"], st[2]["max_depth"]) == (0, 0)


def test_extract_links_hrefs_domains_and_order(spark):
    from extractpdf4j_spark.functions.htmlops import extract_links
    page = ("<p>see <a href='https://ex.example.org/a?q=1'>first "
            "<b>link</b></a> and <a href='/rel'>second</a> and "
            "<a name='anchor-no-href'>third</a></p>")
    out = extract_links(_df(spark, [(1, page)])).orderBy("pos").collect()
    assert [r["href"] for r in out] == ["https://ex.example.org/a?q=1", "/rel"]
    assert [r["domain"] for r in out] == ["ex.example.org", ""]
    assert out[0]["anchor_text"] == "first link"  # nested tag stripped
    assert out[1]["anchor_text"] == "second"


from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcdefghij", min_size=1, max_size=6)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(_word, min_size=10, max_size=25),
                min_size=1, max_size=8))
def test_main_content_roundtrip_property(spark, paras):
    """Link-free paragraphs of >= strong_words words all classify as
    content and reassemble in order."""
    from extractpdf4j_spark.functions.htmlops import extract_main_content
    texts = [" ".join(ws) for ws in paras]
    page = "".join(f"<p>{t}</p>" for t in texts)
    out = extract_main_content(
        spark.createDataFrame([(1, page)], "doc_id long, html string")
    ).collect()[0]
    assert out["main_text"] == "\n".join(texts)
    assert out["n_blocks_kept"] == len(paras)


TABLE_PAGE = (
    "<html><body><p>intro</p>"
    '<TABLE class="x"><TR><TH>A</TH><th  align="c">B &amp; C</th></TR>'
    '<tr><td>1</td><td><b>two</b>-x</td></tr>'
    "<tr><td>ragged</td></tr>"
    "<tr><td>3</td><td></td></tr></TABLE>"
    "<table><tr><td>solo</td></tr></table>"
    "</body></html>"
)


def test_html_tables_grid_headers_entities_ragged(spark):
    from extractpdf4j_spark.functions.htmlops import html_tables
    out = html_tables(_df(spark, [(1, TABLE_PAGE)])) \
        .orderBy("table_idx", "row_idx", "col_idx").collect()
    # table 0: 4 rows (2+2+1+2 cells) + table 1: 1 row/1 cell
    assert [(r["table_idx"], r["row_idx"], r["col_idx"]) for r in out] == [
        (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1), (0, 2, 0),
        (0, 3, 0), (0, 3, 1), (1, 0, 0)]
    grid = {(r["table_idx"], r["row_idx"], r["col_idx"]): r for r in out}
    assert grid[(0, 0, 0)]["text"] == "A"
    assert grid[(0, 0, 0)]["is_header"] == 1
    assert grid[(0, 0, 1)]["text"] == "B & C"          # entity unescaped
    assert grid[(0, 1, 1)]["text"] == "two -x"         # nested tag -> space
    assert grid[(0, 1, 1)]["is_header"] == 0
    assert grid[(0, 3, 1)]["text"] == ""               # empty cell kept
    assert grid[(1, 0, 0)]["text"] == "solo"


def test_html_tables_no_table_and_script_noise(spark):
    from extractpdf4j_spark.functions.htmlops import html_tables
    noise = ("<html><script>'<table><tr><td>fake</td></tr></table>'"
             "</script><p>plain</p></html>")
    assert html_tables(_df(spark, [(1, noise)])).count() == 0


def test_html_table_stats_shape_and_raggedness(spark):
    from extractpdf4j_spark.functions.htmlops import (html_tables,
                                                      html_table_stats)
    out = html_table_stats(html_tables(_df(spark, [(1, TABLE_PAGE)]))) \
        .orderBy("table_idx").collect()
    t0, t1 = out
    assert (t0["n_rows"], t0["n_cols"], t0["n_header_cells"],
            t0["is_ragged"]) == (4, 2, 2, 1)
    assert (t1["n_rows"], t1["n_cols"], t1["n_header_cells"],
            t1["is_ragged"]) == (1, 1, 0, 0)


def test_html_tables_randomized_roundtrip(spark):
    """Generate 60 random grids (ragged widths, th/td mix, attribute
    noise, mixed tag case), render them to HTML, and require the
    parsed cell grid to equal the generator's ground truth exactly —
    the property no planted fixture family happens to hit."""
    import random
    from extractpdf4j_spark.functions.htmlops import html_tables
    rng = random.Random(42)
    alpha = "abcXYZ019 .$,-"
    rows, truth = [], {}
    for doc in range(60):
        n_tables = rng.randint(0, 3)
        html_parts = [f"<p>doc {doc}</p>"]
        for t in range(n_tables):
            tag = rng.choice(["table", "TABLE", "Table"])
            attrs = rng.choice(["", ' class="x"', ' border="1" id="t"'])
            html_parts.append(f"<{tag}{attrs}>")
            for r in range(rng.randint(1, 4)):
                html_parts.append(rng.choice(["<tr>", "<TR>", '<tr align="l">']))
                for c in range(rng.randint(1, 4)):
                    hdr = rng.random() < 0.3
                    txt = "".join(rng.choice(alpha)
                                  for _ in range(rng.randint(0, 6))).strip()
                    cell_tag = ("th" if hdr else "td")
                    html_parts.append(
                        f"<{cell_tag}>{txt}</{cell_tag}>")
                    truth[(doc, t, r, c)] = (1 if hdr else 0,
                                             " ".join(txt.split()))
                html_parts.append("</tr>")
            html_parts.append(f"</{tag.lower()}>")
        rows.append((doc, "<html><body>" + "".join(html_parts)
                     + "</body></html>"))
    got = {(r["doc_id"], r["table_idx"], r["row_idx"], r["col_idx"]):
           (r["is_header"], r["text"])
           for r in html_tables(_df(spark, rows)).collect()}
    assert got == truth
