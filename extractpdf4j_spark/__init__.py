"""extractpdf4j_spark — a PySpark-native table-extraction analytics engine.

A from-scratch re-expression of the capabilities of ExtractPDF4J
(reference: /root/reference, Java/PDFBox/OpenCV/Tesseract) as an
idiomatic PySpark pipeline:

* the three parsing strategies — stream (text-position clustering),
  lattice (ruling-line grid detection), ocrstream (OCR word layout) —
  are implemented as **vectorized numpy kernels** driven from Arrow-batched
  ``mapInPandas`` / ``applyInPandas`` UDFs (no per-row Python),
* the hybrid orchestrator (score + argmax with the reference's exact
  tie-break order) runs as a doc-hash-partitioned ``mapInPandas`` stage,
* input is an Iceberg-style table of interleaved text+media documents
  ``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``,
* output is the ordered-span re-serialization of the winning tables plus a
  per-document metrics/lineage table enabling checkpointed resume.

Nothing in this package is a port of the reference's class structure; the
reference defines *what* to compute (operator semantics, constants,
tie-breaks), cited per function as ``file:line`` in docstrings.
"""

__version__ = "0.1.0"
