"""Frozen job configuration, shipped to executors with the extraction UDFs.

Mirrors the reference's parser builder/annotation config surface:

* pages selection           — BaseParser.java:61 (default "1"; our batch
                              pipeline defaults to "all" since a corpus job
                              extracts whole documents)
* stripText                 — BaseParser.java:67 (default true)
* lattice dpi / min cell    — LatticeParser.java:47-56 (300f, 20x10)
* ocrstream dpi             — OcrStreamParser.java:32 (450f)
* hybrid minScore           — HybridParser.java:51 (0.0)
* requiredHeaders           — OcrStreamParser.java:35 (empty)
* OCR PSM sweep             — Ocr.java:30 ("6","4","11","3")

The reference's ``System.exit`` paths on minScore/headers failures
(HybridParser.java:198-201, OcrStreamParser.java:69-72) become per-document
``status`` values in the metrics table — a Spark job must never die because
one document fails a gate.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, asdict

MODE_STREAM = "stream"
MODE_LATTICE = "lattice"
MODE_OCRSTREAM = "ocrstream"
MODE_HYBRID = "hybrid"


@dataclass(frozen=True)
class ExtractConfig:
    mode: str = MODE_HYBRID
    pages: str = "all"
    strip_text: bool = True
    lattice_dpi: float = 300.0
    ocr_dpi: float = 450.0
    min_score: float = 0.0
    min_cell_w: float = 20.0
    min_cell_h: float = 10.0
    required_headers: tuple[str, ...] = ()
    ocr_psms: tuple[int, ...] = (6, 4, 11, 3)
    # Tesseract config parity with the reference's tess.* system
    # properties (Ocr.java:189-196): language ("eng", "eng+fra", ...),
    # page segmentation mode, and OCR engine mode
    tess_lang: str = "eng"
    tess_psm: int = 6
    tess_oem: int = 1
    # "auto" prefers real Tesseract when importable; "embedded" forces
    # the deterministic payload word-layer backend (reproducible runs,
    # and the ocrstream gate corpus whose rasters are blank)
    ocr_backend: str = "auto"
    # documented-but-unimplemented in the reference
    # (docs/advanced-usage/columns.md:42-46, table-areas.md:55-69 — no
    # implementation exists there); here they are working opt-ins:
    # explicit stream column boundaries (x positions, points), and
    # table regions (x1,y1,x2,y2 in points, origin bottom-left) that
    # confine the stream parser's glyphs
    columns: tuple[float, ...] = ()
    table_areas: tuple[tuple[float, float, float, float], ...] = ()
    # scale knobs (no reference analog — Spark-side physical tuning)
    arrow_batch_docs: int = 128
    shuffle_partitions: int | None = None

    def config_hash(self) -> str:
        """Stable hash recorded in per-partition lineage."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def strategies(self) -> tuple[str, ...]:
        if self.mode == MODE_HYBRID:
            return (MODE_STREAM, MODE_LATTICE, MODE_OCRSTREAM)
        return (self.mode,)
