"""HTML main-content extraction (boilerplate strip + DOM heuristics).

The north rule's extraction pipeline names three front doors: PDF/layout
parse (the kernel families), HTML boilerplate strip, and DOM heuristics
— this module is the HTML side, a readability/boilerpipe-style
main-content extractor expressed entirely in codegen string/regex
expressions (no per-row Python, no external HTML parser):

* :func:`html_blocks` — segment a document into block-level text blocks
  with per-block visible text, word count and link density;
* :func:`extract_main_content` — classify blocks content/boilerplate
  (word-count + link-density thresholds with boilerpipe's neighbour
  rescue rule) and reassemble the main text;
* :func:`dom_stats` — tag counts and maximum nesting depth per
  document (the DOM-shape features quality classifiers consume);
* :func:`spanize_html` — adapter emitting the pipeline's
  ``(doc_id, spans)`` shape so HTML documents flow into the same
  two-stage extraction job as PDFs.

Every regex is RE2-safe (no backreferences, no lookaround) so the
DuckDB oracles run the identical pattern; entity unescaping is a fixed
replace chain applied in the same order on both engines.

Scale: segmentation/classification are pure projections plus one
window over ``(doc, block pos)`` — parallelism is per-document row,
no cross-document state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["html_blocks", "extract_main_content", "dom_stats",
           "extract_links", "spanize_html", "html_tables",
           "html_table_stats", "BLOCK_SPLIT_RE", "TAG_RE", "VOID_TAGS"]

# Closing block-level tags and <br> end a text block. Tag names are
# case-insensitive in HTML, hence (?i) throughout (RE2- and Java-safe).
BLOCK_SPLIT_RE = (r"(?i)</(?:p|div|li|h1|h2|h3|h4|h5|h6|td|tr|table|ul|ol|"
                  r"section|article|header|footer|nav|aside|blockquote)>"
                  r"|<br[^>]*>")
TAG_RE = r"<[^>]*>"
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
# Anchored tag name: '<a' followed by whitespace-attrs or '>' only —
# '<aside>'/'<abbr>' must NOT count their text as link text.
_LINK_INNER_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"

# Void elements never close, so they contribute no nesting depth.
VOID_TAGS = ("br", "img", "hr", "meta", "input", "link", "area", "base",
             "col", "embed", "source", "track", "wbr")

# (entity, replacement) applied IN ORDER; &amp; must come last so
# "&amp;lt;" unescapes once to "&lt;", not twice to "<".
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def _unescape(col):
    for ent, rep in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def _visible_text(col):
    """Strip tags, unescape entities, collapse whitespace."""
    return F.trim(F.regexp_replace(
        _unescape(F.regexp_replace(col, TAG_RE, " ")), r"\s+", " "))


def _strip_noise(col):
    for pat in (_SCRIPT_RE, _STYLE_RE, _COMMENT_RE):
        col = F.regexp_replace(col, pat, " ")
    return col


def html_blocks(df: DataFrame, html_col: str = "html",
                id_col: str = "doc_id") -> DataFrame:
    """Segment HTML into block-level text blocks.

    Returns ``(id, block_id, text, n_words, link_density)`` — one row
    per block with non-empty visible text. ``link_density`` is the
    fraction of a block's visible characters that sit inside ``<a>``
    elements (the single strongest boilerplate signal in
    boilerpipe-class classifiers: navs/footers are link lists).

    Pure projection + explode; every operation is a codegen string
    expression."""
    cleaned = _strip_noise(F.coalesce(F.col(html_col), F.lit("")))
    blocks = F.split(cleaned, BLOCK_SPLIT_RE)
    staged = (df.select(F.col(id_col),
                        F.posexplode(blocks).alias("block_id", "_raw")))
    text = _visible_text(F.col("_raw"))
    link_join = F.array_join(
        F.regexp_extract_all(F.col("_raw"), F.lit(_LINK_INNER_RE), 1), " ")
    link_text = _visible_text(link_join)
    staged = staged.select(
        id_col,
        F.col("block_id").cast("long").alias("block_id"),
        text.alias("text"),
        link_text.alias("_ltext"))
    n_words = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " "))).cast("long")
    density = F.round(
        F.length("_ltext")
        / F.greatest(F.length("text"), F.lit(1)).cast("double"), 6)
    return (staged
            .select(id_col, "block_id", "text",
                    n_words.alias("n_words"),
                    density.alias("link_density"))
            .filter(F.col("text") != ""))


def _classify_blocks(b: DataFrame, id_col: str, strong_words: int,
                     weak_words: int,
                     max_link_density: float) -> DataFrame:
    """Shared content/boilerplate classification (the ONE copy of the
    keep rule — extract_main_content and spanize_html must not
    diverge): strong = long + low link density; weak blocks are rescued
    when an adjacent (non-empty) block is strong."""
    low_density = F.col("link_density") <= max_link_density
    strong = (F.col("n_words") >= strong_words) & low_density
    w = Window.partitionBy(id_col).orderBy("block_id")
    near_strong = (F.coalesce(F.lag(strong).over(w), F.lit(False))
                   | F.coalesce(F.lead(strong).over(w), F.lit(False)))
    keep = strong | ((F.col("n_words") >= weak_words) & low_density
                     & near_strong)
    return b.withColumn("_keep", keep)


def extract_main_content(df: DataFrame, html_col: str = "html",
                         id_col: str = "doc_id",
                         strong_words: int = 10,
                         weak_words: int = 3,
                         max_link_density: float = 0.33) -> DataFrame:
    """Readability-style main-content extraction.

    A block is **content** if it has >= ``strong_words`` words at
    <= ``max_link_density``; a short block (>= ``weak_words``) is
    rescued when an adjacent block is strong (boilerpipe's context
    rule — captions and single-sentence paragraphs between real
    paragraphs survive, isolated nav crumbs don't).

    Returns ``(id, main_text, n_blocks_kept, n_blocks_total,
    n_chars_main)``; every input document appears exactly once —
    documents whose every block is boilerplate (or whose HTML has no
    visible text at all) survive with empty ``main_text``. One window
    over ``(id, block_id)`` plus one aggregation on ``id`` and a left
    join back to the input ids — no cross-document state."""
    marked = _classify_blocks(html_blocks(df, html_col, id_col), id_col,
                              strong_words, weak_words, max_link_density)
    kept_struct = F.when(F.col("_keep"), F.struct("block_id", "text"))
    agg = (marked.groupBy(id_col)
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["text"]),
                    "\n").alias("main_text"),
                F.count(F.when(F.col("_keep"), F.lit(1)))
                .alias("n_blocks_kept"),
                F.count("*").alias("n_blocks_total")))
    zero = F.lit(0).cast("long")
    return (df.select(id_col).join(agg, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("main_text"), F.lit("")).alias("main_text"),
                F.coalesce(F.col("n_blocks_kept"), zero)
                .alias("n_blocks_kept"),
                F.coalesce(F.col("n_blocks_total"), zero)
                .alias("n_blocks_total"))
            .withColumn("n_chars_main",
                        F.length("main_text").cast("long")))


def dom_stats(df: DataFrame, html_col: str = "html",
              id_col: str = "doc_id") -> DataFrame:
    """DOM-shape features per document: tag/link/paragraph counts and
    maximum nesting depth.

    Depth is computed from the tag stream (open +1, close -1, void
    elements skipped) with a running sum over the tag position — one
    window keyed on ``(id, pos)``, then a max per document. Tagless
    documents survive with all-zero features (posexplode_outer keeps
    their row; the null tag contributes depth 0)."""
    cleaned = _strip_noise(F.coalesce(F.col(html_col), F.lit("")))
    n_tags = F.regexp_count(cleaned, F.lit(r"(?i)<[a-z][^>]*>")).cast("long")
    n_links = F.regexp_count(cleaned, F.lit(r"(?i)<a[\s>]")).cast("long")
    n_paras = F.regexp_count(cleaned, F.lit(r"(?i)<p[\s>]")).cast("long")
    base = df.select(F.col(id_col), n_tags.alias("n_tags"),
                     n_links.alias("n_links"), n_paras.alias("n_paras"),
                     F.regexp_extract_all(
                         cleaned, F.lit(r"(?i)</?[a-z][a-z0-9]*"), 0
                     ).alias("_tags"))
    toks = base.select(id_col, "n_tags", "n_links", "n_paras",
                       F.posexplode_outer("_tags").alias("pos", "tag"))
    name = F.lower(F.regexp_replace("tag", r"^</?", ""))
    delta = (F.when(F.col("tag").isNull(), F.lit(0))
             .when(F.col("tag").startswith("</"), F.lit(-1))
             .when(name.isin(*VOID_TAGS), F.lit(0))
             .otherwise(F.lit(1)))
    w = (Window.partitionBy(id_col).orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    depth = F.sum(delta).over(w)
    return (toks.withColumn("_depth", depth)
            .groupBy(id_col, "n_tags", "n_links", "n_paras")
            .agg(F.max("_depth").cast("long").alias("max_depth")))


def extract_links(df: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """Outlink extraction — the crawl-graph edge list web pipelines
    mine from HTML (dedup by URL, PageRank-style quality signals,
    frontier seeding).

    Returns ``(id, pos, href, domain, anchor_text)`` — one row per
    ``<a href=...>`` in document order; ``domain`` is empty for
    relative links. Pure projection + explode, codegen regex only."""
    cleaned = _strip_noise(F.coalesce(F.col(html_col), F.lit("")))
    els = F.regexp_extract_all(
        cleaned, F.lit(r"(?is)<a(?:\s[^>]*)?>.*?</a>"), 0)
    staged = df.select(F.col(id_col),
                       F.posexplode(els).alias("pos", "_el"))
    href = F.regexp_extract(
        F.col("_el"), r"""(?is)href\s*=\s*["']([^"']*)["']""", 1)
    anchor = _visible_text(
        F.regexp_extract(F.col("_el"), _LINK_INNER_RE, 1))
    domain = F.regexp_extract(href, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    return (staged.select(
                id_col, F.col("pos").cast("long").alias("pos"),
                href.alias("href"), domain.alias("domain"),
                anchor.alias("anchor_text"))
            .filter(F.col("href") != ""))


# <table> grid extraction. Lazy (non-greedy) matching means NESTED
# tables are not supported: an inner </table> closes the outer match
# (regex subset, same rule both engines). Attributes are allowed on
# every tag; names are case-insensitive.
_TABLE_RE = r"(?is)<table(?:\s[^>]*)?>(.*?)</table>"
_TR_RE = r"(?is)<tr(?:\s[^>]*)?>(.*?)</tr>"
_CELL_RE = r"(?is)<t[dh](?:\s[^>]*)?>.*?</t[dh]>"


def html_tables(df: DataFrame, html_col: str = "html",
                id_col: str = "doc_id") -> DataFrame:
    """Extract HTML ``<table>`` grids into the engine's cell model —
    the web-corpus analog of the PDF table parsers: where the stream /
    lattice / ocrstream kernels recover ``(row, col, text)`` cells from
    glyph geometry, this recovers them from explicit table markup
    (reference scope anchor: the CSV/table sink model,
    ``Table.java``-shaped row/col grids).

    Returns ``(id, table_idx, row_idx, col_idx, is_header, text)`` —
    one row per ``<td>``/``<th>`` cell in document order. Empty cells
    survive with ``text=''`` (grid positions matter); ``is_header`` is
    1 for ``<th>`` cells. Ragged rows are emitted as-is (no padding) —
    :func:`html_table_stats` reports raggedness.

    Scale: one scan → three chained posexplode projections, all
    codegen regex (RE2-safe, replayed verbatim by the DuckDB oracle);
    ZERO shuffles — parallelism is per document row and a giant page
    costs one lazy O(n) regex pass per level."""
    cleaned = _strip_noise(F.coalesce(F.col(html_col), F.lit("")))
    t = df.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(cleaned, F.lit(_TABLE_RE), 1))
        .alias("table_idx", "_tbl"))
    r = t.select(
        id_col, "table_idx",
        F.posexplode(F.regexp_extract_all(F.col("_tbl"), F.lit(_TR_RE), 1))
        .alias("row_idx", "_row"))
    c = r.select(
        id_col, "table_idx", "row_idx",
        F.posexplode(F.regexp_extract_all(F.col("_row"), F.lit(_CELL_RE), 0))
        .alias("col_idx", "_el"))
    is_header = F.when(F.col("_el").rlike(r"(?i)^<th"),
                       F.lit(1)).otherwise(F.lit(0))
    return c.select(
        id_col,
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        is_header.cast("long").alias("is_header"),
        _visible_text(F.col("_el")).alias("text"))


def html_table_stats(cells: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Per-table shape report over :func:`html_tables` output:
    ``(id, table_idx, n_rows, n_cols, n_header_cells, is_ragged)``.
    ``n_cols`` is the widest row; ``is_ragged`` flags tables whose rows
    disagree on width (the quality signal web-table miners filter on).
    Two chained aggregations on prefixes of the same key — row meta
    only, cell text never re-shuffles."""
    per_row = (cells.groupBy(id_col, "table_idx", "row_idx")
               .agg(F.count("*").alias("_w"),
                    F.sum("is_header").alias("_h")))
    return (per_row.groupBy(id_col, "table_idx")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.max("_w").cast("long").alias("n_cols"),
                 F.sum("_h").cast("long").alias("n_header_cells"),
                 (F.min("_w") != F.max("_w")).cast("long")
                 .alias("is_ragged")))


def spanize_html(df: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id", strong_words: int = 10,
                 weak_words: int = 3,
                 max_link_density: float = 0.33) -> DataFrame:
    """Adapter: HTML documents → the pipeline's ``(doc_id, spans)``
    shape, one text span per kept content block, ordered by block
    position — HTML corpora then flow through the same two-stage
    extraction job as PDF span documents. Uses the same
    ``_classify_blocks`` rule as :func:`extract_main_content`."""
    kept = _classify_blocks(html_blocks(df, html_col, id_col), id_col,
                            strong_words, weak_words,
                            max_link_density).filter("_keep")
    span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.col("block_id").cast("int").alias("offset"))
    return (kept.groupBy(id_col)
            .agg(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("block_id", span.alias("s")))),
                     lambda x: x["s"]).alias("spans")))
