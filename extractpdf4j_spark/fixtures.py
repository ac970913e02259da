"""Deterministic synthetic fixture corpus (FIXTURES.md families).

Everything is generated from a fixed seed — no external data. Each family
produces rows for the interleaved ``documents`` table (and the ``media``
side table for raster payloads) engineered to exercise specific reference
thresholds; the anchors are listed per family in FIXTURES.md §4.

Geometry conventions:
* text layer: PDF points, origin bottom-left, US-Letter 612x792pt
* rasters: dpi=100 → 850x1100 px, grayscale uint8, white=255
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from .docmodel import OCR_WORD_COLS, encode_media_payload, encode_text_span

PAGE_W_PT = 612.0
PAGE_H_PT = 792.0
DPI = 100.0
IMG_W = 850
IMG_H = 1100

CHAR_W = 5.0      # glyph-run char advance (pt)
CHAR_H = 8.0      # glyph height (pt)
WORD_GAP = 7.0    # > 6.0 span break, <= 12.0 so no column vote
ROW_DY = 14.0     # y step between rows → distinct /2.0 buckets

VOCAB = ("payment", "transfer", "grocery", "salary", "refund", "fee",
         "interest", "utility", "rent", "card", "online", "market")


# ---------------------------------------------------------------------------
# Text-layer page builders
# ---------------------------------------------------------------------------

def layout_text_rows(rows: list[list[str]], col_x: list[float],
                     y0: float = 700.0, dy: float = ROW_DY,
                     word_gap: float = WORD_GAP,
                     char_w: float = CHAR_W) -> list[tuple]:
    """Lay table rows out as glyph runs: each cell starts at its column x;
    words inside a cell advance with ``word_gap`` (span-break but no
    column vote); inter-column whitespace exceeds 12pt by construction."""
    runs = []
    for r, cells in enumerate(rows):
        y = y0 - r * dy
        for c, cell in enumerate(cells):
            if not cell:
                continue
            x = col_x[c]
            for word in cell.split(" "):
                if word == "":
                    continue
                w = char_w * len(word)
                runs.append((x, y, w, CHAR_H, word))
                x += w + word_gap
    return runs


def statement_rows(rng: random.Random, n: int) -> list[list[str]]:
    """Bank-statement-style rows: Date / Description / Debit / Credit / Balance."""
    months = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    rows = [["Date", "Description", "Debit", "Credit", "Balance"]]
    bal = 1000.0
    for _ in range(n):
        day = rng.randint(1, 28)
        mon = months[rng.randrange(12)]
        desc = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 2)))
        amt = rng.randint(100, 99999) / 100.0
        debit = rng.random() < 0.5
        bal += -amt if debit else amt
        rows.append([
            f"{day:02d} {mon} 2025", desc,
            f"{amt:.2f}" if debit else "",
            "" if debit else f"{amt:.2f}",
            f"{bal:.2f}",
        ])
    return rows


STMT_COL_X = [40.0, 130.0, 300.0, 390.0, 480.0]


# ---------------------------------------------------------------------------
# Raster builders
# ---------------------------------------------------------------------------

def blank_page() -> np.ndarray:
    return np.full((IMG_H, IMG_W), 255, dtype=np.uint8)


def draw_grid(img: np.ndarray, rows_y: list[int], cols_x: list[int],
              thickness: int = 2) -> None:
    x0, x1 = cols_x[0], cols_x[-1]
    y0, y1 = rows_y[0], rows_y[-1]
    for y in rows_y:
        img[y:y + thickness, x0:x1 + thickness] = 0
    for x in cols_x:
        img[y0:y1 + thickness, x:x + thickness] = 0


def words_df(entries: list[tuple]) -> pd.DataFrame:
    """entries: (text, left, top, width, height, block, par, line, word)."""
    rows = [{
        "left": e[1], "top": e[2], "width": e[3], "height": e[4],
        "conf": 92, "text": e[0], "block": e[5], "par": e[6],
        "line": e[7], "word": e[8],
    } for e in entries]
    df = pd.DataFrame(rows, columns=OCR_WORD_COLS)
    for c in OCR_WORD_COLS:
        if c != "text":
            df[c] = df[c].astype(np.int64)
    return df


def layout_ocr_rows(rows: list[list[str]], col_left: list[int],
                    top0: int = 120, dy: int = 40, height: int = 20,
                    char_px: int = 9, word_gap_px: int = 12,
                    right_edges: dict[int, int] | None = None) -> list[tuple]:
    """Lay table rows out as Tesseract-style word boxes (pixel coords,
    top-down). Each OCR line gets its own (block,par,line) key.

    ``right_edges`` right-aligns single-word cells of the given columns at
    the given x (amounts on real statements are right-aligned, which is
    what the reference's right-edge anchoring rule expects,
    OcrStreamParser.java:191)."""
    entries = []
    for r, cells in enumerate(rows):
        top = top0 + r * dy
        wnum = 1
        for c, cell in enumerate(cells):
            if not cell:
                continue
            left = col_left[c]
            words = [w for w in cell.split(" ") if w]
            if (right_edges and c in right_edges and len(words) == 1 and r > 0):
                wpx = char_px * len(words[0])
                entries.append((words[0], right_edges[c] - wpx, top, wpx,
                                height, 1, 1, r + 1, wnum))
                wnum += 1
                continue
            for word in words:
                wpx = char_px * len(word)
                entries.append((word, left, top, wpx, height, 1, 1, r + 1, wnum))
                wnum += 1
                left += wpx + word_gap_px
    return entries


# ---------------------------------------------------------------------------
# Document assembly
# ---------------------------------------------------------------------------

class FixtureBuilder:
    """Accumulates documents + media rows with deterministic content."""

    def __init__(self, seed: int = 42):
        self.seed = seed
        self.documents: list[dict] = []
        self.media: list[dict] = []

    def _rng(self, doc_id: str) -> random.Random:
        return random.Random(f"{self.seed}:{doc_id}")

    def add_doc(self, doc_id: str, pages: list[dict]) -> None:
        """pages: [{'runs': [...] | None, 'image': ndarray | None,
        'words': DataFrame | None}] — one entry per page (1-based order)."""
        spans = []
        off = 0
        for i, pg in enumerate(pages, start=1):
            if pg.get("runs") is not None:
                spans.append({"kind": "text",
                              "text": encode_text_span(i, pg["runs"]),
                              "media_ref": "", "offset": off})
                off += 1
            if pg.get("image") is not None:
                ref = f"{doc_id}/p{i}"
                payload = encode_media_payload(
                    i, pg["image"], DPI, PAGE_W_PT, PAGE_H_PT,
                    pg.get("words"))
                self.media.append({"media_ref": ref, "doc_id": doc_id,
                                   "page": i, "payload": payload})
                spans.append({"kind": "media", "text": "",
                              "media_ref": ref, "offset": off})
                off += 1
        self.documents.append({"doc_id": doc_id, "spans": spans})

    # -- families ----------------------------------------------------------

    def stmt_text(self, doc_id: str, n_rows: int = 8, n_pages: int = 1) -> None:
        """Digital bank statement (stream path; StreamParser.java:171,197)."""
        rng = self._rng(doc_id)
        pages = []
        for _ in range(n_pages):
            rows = statement_rows(rng, n_rows)
            pages.append({"runs": layout_text_rows(rows, STMT_COL_X)})
        self.add_doc(doc_id, pages)

    def stmt_tight(self, doc_id: str) -> None:
        """Gaps straddling the 6.0/12.0 thresholds and Y values straddling
        /2.0 bucket edges (round-half-up parity; StreamParser.java:123)."""
        runs = [
            # y=701.0 → 701/2=350.5 → bucket 351 (floor(+.5)); y=700.9 → 350
            (40.0, 701.0, 20.0, CHAR_H, "alpha"),
            (66.0, 701.0, 20.0, CHAR_H, "beta"),     # gap 6.0 → same span
            (92.1, 701.0, 20.0, CHAR_H, "gamma"),    # gap 6.1 → new span
            (125.0, 701.0, 20.0, CHAR_H, "delta"),   # gap 12.9 → vote
            (40.0, 700.9, 20.0, CHAR_H, "eps"),      # different bucket
            (72.0, 687.0, 20.0, CHAR_H, "zeta"),     # gap 12.0 → no vote
            (40.0, 687.0, 20.0, CHAR_H, "eta"),
            (125.0, 687.0, 20.0, CHAR_H, "theta"),   # aligns delta's column
        ]
        self.add_doc(doc_id, [{"runs": runs}])

    def grid_ruled(self, doc_id: str, n_rows: int = 5, n_cols: int = 4) -> None:
        """Ruled table, text layer present (lattice path;
        LatticeParser.java:160-167,268-307): includes a near-duplicate
        line within 3px (dedupe) and an open outer border (closing)."""
        rng = self._rng(doc_id)
        img = blank_page()
        rows_y = [100 + r * 120 for r in range(n_rows + 1)]
        cols_x = [60 + c * 180 for c in range(n_cols + 1)]
        draw_grid(img, rows_y, cols_x)
        img[rows_y[2] + 2:rows_y[2] + 4, cols_x[0]:cols_x[-1]] = 0  # dup line ≤3px
        runs = []
        for r in range(n_rows):
            for c in range(n_cols):
                tok = rng.choice(VOCAB) + str(rng.randint(0, 99))
                cy_img = (rows_y[r] + rows_y[r + 1]) / 2.0
                cx_img = cols_x[c] + 15.0
                y_pt = PAGE_H_PT - cy_img * 72.0 / DPI - CHAR_H / 2.0
                x_pt = cx_img * 72.0 / DPI
                runs.append((x_pt, y_pt, CHAR_W * len(tok), CHAR_H, tok))
        self.add_doc(doc_id, [{"runs": runs, "image": img}])

    def grid_scanned(self, doc_id: str, n_rows: int = 5, n_cols: int = 4) -> None:
        """Scanned ruled table filling the page (lines <=3px from every
        edge → no border closing), no text layer; OCR words all share one
        (block,par,line) key, modelling Tesseract mis-grouping on ruled
        pages. ocrstream collapses to one row while lattice's per-cell
        fallback reconstructs the grid → lattice wins the hybrid argmax."""
        rng = self._rng(doc_id)
        img = blank_page()
        rows_y = [2 + r * (IMG_H - 5) // n_rows for r in range(n_rows)] + [IMG_H - 3]
        cols_x = [2 + c * (IMG_W - 5) // n_cols for c in range(n_cols)] + [IMG_W - 3]
        draw_grid(img, rows_y, cols_x)
        entries = []
        k = 1
        for r in range(n_rows):
            for c in range(n_cols):
                tok = rng.choice(VOCAB) + str(rng.randint(0, 9))
                entries.append((tok, cols_x[c] + 30, rows_y[r] + 50,
                                9 * len(tok), 20, 1, 1, 1, k))
                k += 1
        self.add_doc(doc_id, [{"image": img, "words": words_df(entries)}])

    def grid_sparse(self, doc_id: str) -> None:
        """Scanned ruled grid, <25% filled → per-cell OCR fallback; one
        cell below 20x10px skipped (LatticeParser.java:189-205)."""
        rng = self._rng(doc_id)
        img = blank_page()
        rows_y = [100, 220, 340, 460, 580]
        cols_x = [60, 240, 420, 600, 615, 780]   # 600→615 = 15px < minCellW
        draw_grid(img, rows_y, cols_x)
        entries = []
        k = 1
        for (r, c) in [(0, 0), (2, 1)]:   # 2 words for 20 cells → sparse
            tok = rng.choice(VOCAB)
            entries.append((tok, cols_x[c] + 20, rows_y[r] + 40,
                            9 * len(tok), 20, 1, 1, r + 1, k))
            k += 1
        self.add_doc(doc_id, [{"image": img, "words": words_df(entries)}])

    def ocr_words(self, doc_id: str, n_rows: int = 6, typo: bool = True) -> None:
        """Scanned statement with OCR word boxes; header has 1-char typos
        for editDistance<=1 matching (OcrStreamParserTest.java:77-92)."""
        rng = self._rng(doc_id)
        rows = statement_rows(rng, n_rows)
        if typo:
            rows[0] = ["Datc", "Descriptlon", "Debit", "Credit", "Balance"]
        # compact dates (OCR often drops spaces) so the date fits its
        # column; amounts right-aligned like real statements
        for r in rows[1:]:
            r[0] = r[0].replace(" ", "")
        entries = layout_ocr_rows(rows, [60, 160, 400, 520, 650],
                                  right_edges={2: 450, 3: 575, 4: 760})
        self.add_doc(doc_id, [{"image": blank_page(),
                               "words": words_df(entries)}])

    def ocr_headerless(self, doc_id: str, n_rows: int = 9) -> None:
        """No detectable header → fallback separator histogram
        (OcrStreamParser.java:357-387)."""
        rng = self._rng(doc_id)
        rows = [[rng.choice(VOCAB), f"{rng.randint(100, 9999) / 100.0:.2f}",
                 f"{rng.randint(100, 9999) / 100.0:.2f}"]
                for _ in range(n_rows)]
        entries = layout_ocr_rows(rows, [60, 360, 640])
        self.add_doc(doc_id, [{"image": blank_page(),
                               "words": words_df(entries)}])

    def ocr_amounts(self, doc_id: str, n_rows: int = 6) -> None:
        """Numeric/date normalization with OCR confusions O/I/L/S
        (OcrStreamParser.java:400-438)."""
        rng = self._rng(doc_id)
        rows = [["Date", "Description", "Debit", "Credit", "Balance"]]
        for i in range(n_rows):
            amt = f"{rng.randint(1, 9)},{rng.randint(100, 999)}.{rng.randint(10, 99)}0"
            # only 1/3 of cells carry OCR confusions so the clean >=60%
            # majority still triggers NUM_LIKE normalization
            # (OcrStreamParser.java:416-418: 'O' is outside NUM_LIKE)
            fuzzy = amt.replace("0", "O") if i % 3 == 0 else amt
            cents = f"{rng.randint(1, 9)},{rng.randint(10, 99)}"  # 1,23 → .23
            rows.append([f"{rng.randint(1, 28)}Jul2025", rng.choice(VOCAB),
                         fuzzy, cents, f"{rng.randint(100, 999)}.50"])
        entries = layout_ocr_rows(rows, [60, 180, 400, 520, 650],
                                  right_edges={2: 455, 3: 570, 4: 760})
        self.add_doc(doc_id, [{"image": blank_page(),
                               "words": words_df(entries)}])

    def mixed_tie(self, doc_id: str) -> None:
        """Stream and lattice tie exactly → lattice must win
        (HybridParser.java:257-263)."""
        runs = [(100.0, 400.0, 25.0, CHAR_H, "lonely")]
        self.add_doc(doc_id, [{"runs": runs, "image": blank_page()}])

    def empty_doc(self, doc_id: str) -> None:
        """No extractable content → no_tables status, empty spans
        (BaseParser.java:169-176)."""
        self.add_doc(doc_id, [{"runs": []}])

    def skew_big(self, doc_id: str, n_pages: int = 50) -> None:
        """One huge document among 1-pagers (salting/scaling bench)."""
        self.stmt_text(doc_id, n_rows=10, n_pages=n_pages)

    # -- corpus assembly ----------------------------------------------------

    def standard_corpus(self) -> "FixtureBuilder":
        self.stmt_text("stmt-1")
        self.stmt_text("stmt-2", n_rows=5, n_pages=2)
        self.stmt_tight("tight-1")
        self.grid_ruled("ruled-1")
        self.grid_scanned("scan-1")
        self.grid_sparse("sparse-1")
        self.ocr_words("ocrw-1")
        self.ocr_words("ocrw-2", typo=False)
        self.ocr_headerless("ocrh-1")
        self.ocr_amounts("ocra-1")
        self.mixed_tie("tie-1")
        self.empty_doc("empty-1")
        return self

    def to_pandas(self) -> tuple[pd.DataFrame, pd.DataFrame]:
        docs = pd.DataFrame({
            "doc_id": [d["doc_id"] for d in self.documents],
            "spans": [d["spans"] for d in self.documents],
        })
        media = pd.DataFrame(self.media,
                             columns=["media_ref", "doc_id", "page", "payload"])
        return docs, media


# ---------------------------------------------------------------------------
# Corpus-scale fixture derivation (bench / entry): flat text docs → span docs
# ---------------------------------------------------------------------------

def doc_family(doc_id: int) -> str:
    """Deterministic strategy mix: 60% digital text, 20% ruled digital,
    20% scanned (OCR words)."""
    m = doc_id % 10
    if m < 6:
        return "text"
    if m < 8:
        return "ruled"
    return "scanned"


def build_from_corpus_pdf(pdf: pd.DataFrame, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Convert a batch of flat documents (doc_id:int64, text:string) into
    interleaved span documents + media payloads. Pure function of
    (doc_id, text, seed) — safe inside mapInPandas."""
    fb = FixtureBuilder(seed)
    for t in pdf.itertuples(index=False):
        doc_id = int(t.doc_id)
        words = [w for w in str(t.text).replace("|", " ").split() if w]
        fam = doc_family(doc_id)
        sid = f"doc-{doc_id}"
        ncols = 5
        rows = [words[i:i + ncols] for i in range(0, len(words), ncols)]
        rows = [r + [""] * (ncols - len(r)) for r in rows][:12]
        if not rows:
            fb.empty_doc(sid)
            continue
        if fam == "text":
            fb.add_doc(sid, [{"runs": layout_text_rows(rows, STMT_COL_X)}])
        elif fam == "ruled":
            img = blank_page()
            rows_y = [100 + r * 70 for r in range(len(rows) + 1)]
            cols_x = [60 + c * 150 for c in range(ncols + 1)]
            draw_grid(img, rows_y, cols_x)
            runs = []
            for r, cells in enumerate(rows):
                cy_img = (rows_y[r] + rows_y[r + 1]) / 2.0
                y_pt = PAGE_H_PT - cy_img * 72.0 / DPI - CHAR_H / 2.0
                for c, tok in enumerate(cells):
                    if not tok:
                        continue
                    x_pt = (cols_x[c] + 12.0) * 72.0 / DPI
                    runs.append((x_pt, y_pt, CHAR_W * len(tok), CHAR_H, tok))
            fb.add_doc(sid, [{"runs": runs, "image": img}])
        else:
            entries = layout_ocr_rows(rows, [60, 200, 360, 520, 680])
            fb.add_doc(sid, [{"image": blank_page(),
                              "words": words_df(entries)}])
    return fb.to_pandas()
