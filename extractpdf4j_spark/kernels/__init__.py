"""Vectorized per-page extraction kernels (numpy/pandas, Arrow-batch hot path)."""

from .stream import stream_extract_page
from .lattice import lattice_extract_page
from .ocrstream import ocrstream_extract_page

__all__ = ["stream_extract_page", "lattice_extract_page", "ocrstream_extract_page"]
