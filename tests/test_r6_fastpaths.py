"""Round-6 optimization fast paths: each must be bit-identical to the
generic/reference path it replaces (no Spark session needed)."""

import io

import numpy as np
import pandas as pd
import pytest

from extractpdf4j_spark import imageops
from extractpdf4j_spark.docmodel import (OCR_WORD_COLS, decode_media_payload,
                                         encode_media_payload)
from extractpdf4j_spark.textnorm import edit_distance, edit_distance_le1


def _ref_binarize(g):
    """The generic strip-tiled path, forced (what the bilevel fast path
    must reproduce bit-for-bit)."""
    out = np.empty(g.shape, dtype=np.uint8)
    for y0 in range(0, g.shape[0], 128):
        y1 = min(g.shape[0], y0 + 128)
        out[y0:y1] = imageops._binarize_region_rows(g, y0, y1)
    return out


def _ref_detect(g, k):
    bw = _ref_binarize(g)
    return (imageops.project_open_lines(bw, k, True),
            imageops.project_open_lines(bw, k, False))


def _cases():
    rng = np.random.default_rng(7)
    # bilevel with ruled lines + a filled block (candidate-rich)
    g1 = np.full((300, 400), 255, dtype=np.uint8)
    g1[80:83, :] = 0
    g1[:, 120:122] = 0
    g1[200:260, 40:160] = 0
    # sparse bilevel noise
    g2 = (rng.integers(0, 2, size=(200, 150)) * 255).astype(np.uint8)
    # all-white / all-black degenerate bilevel
    g3 = np.full((64, 64), 255, dtype=np.uint8)
    g4 = np.zeros((64, 64), dtype=np.uint8)
    # grayscale (must take the generic path and still agree)
    g5 = rng.integers(0, 256, size=(150, 220)).astype(np.uint8)
    return [g1, g2, g3, g4, g5]


def test_bilevel_binarize_bit_identical():
    for g in _cases():
        assert np.array_equal(_ref_binarize(g),
                              imageops.binarize_for_lines(g)), g.shape


def test_bilevel_detect_line_positions_bit_identical():
    for g in _cases():
        r0, c0 = _ref_detect(g, 10)
        r1, c1 = imageops.detect_line_positions(g, 10)
        assert np.array_equal(r0, r1) and np.array_equal(c0, c1), g.shape


def test_is_bilevel_detection():
    assert imageops._is_bilevel(np.array([[0, 255]], dtype=np.uint8))
    assert not imageops._is_bilevel(np.array([[0, 254]], dtype=np.uint8))
    assert not imageops._is_bilevel(np.array([[1, 255]], dtype=np.uint8))


def _ref_decode(payload):
    """np.load-based reference decode (the pre-r6 implementation)."""
    with np.load(io.BytesIO(payload), allow_pickle=True) as z:
        words = pd.DataFrame({
            "left": z["ocr_left"], "top": z["ocr_top"],
            "width": z["ocr_width"], "height": z["ocr_height"],
            "conf": z["ocr_conf"], "text": list(z["ocr_text"]),
            "block": z["ocr_block"], "par": z["ocr_par"],
            "line": z["ocr_line"], "word": z["ocr_word"],
        })
        if "image_bits" in z:
            h, w = (int(v) for v in z["image_shape"])
            image = (np.unpackbits(z["image_bits"], count=h * w)
                     .reshape(h, w) * np.uint8(255))
        else:
            image = z["image"]
        return (int(z["page"]), image, float(z["dpi"]),
                float(z["page_width_pt"]), float(z["page_height_pt"]), words)


@pytest.mark.parametrize("bilevel", [True, False])
def test_fast_npz_decode_matches_np_load(bilevel):
    if bilevel:
        img = (np.arange(120 * 80).reshape(120, 80) % 2 * 255).astype(np.uint8)
    else:
        img = (np.arange(120 * 80).reshape(120, 80) % 251).astype(np.uint8)
    words = pd.DataFrame({
        "left": np.array([3, 40], dtype=np.int32),
        "top": np.array([5, 5], dtype=np.int32),
        "width": np.array([20, 25], dtype=np.int32),
        "height": np.array([10, 10], dtype=np.int32),
        "conf": np.array([90, 80], dtype=np.int32),
        "text": ["hello", "world"],
        "block": np.array([1, 1], dtype=np.int32),
        "par": np.array([1, 1], dtype=np.int32),
        "line": np.array([1, 1], dtype=np.int32),
        "word": np.array([1, 2], dtype=np.int32),
    })[OCR_WORD_COLS]
    payload = encode_media_payload(4, img, 144.0, 612.0, 792.0, words)
    page, rimg, dpi, wpt, hpt, rwords = _ref_decode(payload)
    p = decode_media_payload(payload)
    assert (p.page, p.dpi, p.page_width_pt, p.page_height_pt) == \
        (page, dpi, wpt, hpt)
    assert np.array_equal(p.image, rimg)
    pd.testing.assert_frame_equal(p.words.reset_index(drop=True), rwords)


def test_fast_npz_decode_empty_words():
    img = np.zeros((10, 10), dtype=np.uint8)
    payload = encode_media_payload(1, img, 72.0, 100.0, 100.0, None)
    p = decode_media_payload(payload)
    assert len(p.words) == 0
    assert list(p.words.columns) == OCR_WORD_COLS


def test_edit_distance_le1_matches_reference():
    vocab = ["", "date", "dte", "dates", "dat", "description", "balance",
             "balanse", "xbalancex", "credit", "kredit", "debit", "debt"]
    for a in vocab:
        for b in vocab:
            assert edit_distance_le1(a, b) == (edit_distance(a, b) <= 1), (a, b)
