"""Exactness tests for the tiled/fused image primitives against the
straightforward generic implementations."""

import numpy as np

from extractpdf4j_spark import imageops


def rand_imgs():
    rng = np.random.RandomState(7)
    yield rng.randint(0, 256, (300, 200)).astype(np.uint8)
    yield rng.randint(0, 256, (128, 850)).astype(np.uint8)   # strip boundary
    yield rng.randint(0, 256, (129, 64)).astype(np.uint8)
    yield np.full((50, 50), 255, dtype=np.uint8)
    img = np.full((400, 600), 255, dtype=np.uint8)
    img[100:102, :] = 0
    img[:, 300:302] = 0
    yield img


def test_tiled_binarize_bit_identical_to_generic():
    for img in rand_imgs():
        fast = imageops.binarize_for_lines(img)
        ref = imageops.adaptive_threshold(img, 15, 10, "mean", invert=True)
        assert (fast == ref).all()


def test_fused_integer_threshold_matches_division_path():
    for img in rand_imgs():
        fused = imageops.adaptive_threshold(img, 15, 10, "mean", invert=True)
        mean = imageops._box_mean(img, 15)
        ref = ((img.astype(np.int32) <= mean - 10).astype(np.uint8) * 255)
        assert (fused == ref).all()


def test_project_open_lines_matches_full_morphology():
    for img in rand_imgs():
        bw = imageops.binarize_for_lines(img)
        for k in (5, 10, 25):
            for horiz in (True, False):
                if horiz:
                    opened = imageops.dilate_binary(
                        imageops.erode_binary(bw, k, 1), k, 1)
                else:
                    opened = imageops.dilate_binary(
                        imageops.erode_binary(bw, 1, k), 1, k)
                slow = imageops.project_lines(opened, horiz)
                fast = imageops.project_open_lines(bw, k, horiz)
                assert list(slow) == list(fast), (k, horiz)


def test_window_count_anchor_and_pads():
    m = np.array([[1, 1, 0, 1, 1, 1, 0, 0]], dtype=np.uint8)
    # erode k=3 pad=1: window [i-1, i+1]
    er = imageops._window_count(m, 3, axis=1, pad_value=1) == 3
    assert er.astype(int).tolist() == [[1, 0, 0, 0, 1, 0, 0, 0]]
    di = imageops._window_count(m, 3, axis=1, pad_value=0) > 0
    assert di.astype(int).tolist() == [[1, 1, 1, 1, 1, 1, 1, 0]]


def test_detect_line_positions_matches_unfused_path():
    for img in rand_imgs():
        for k in (5, 10, 25):
            bw = imageops.binarize_for_lines(img)
            want_r = list(imageops.project_open_lines(bw, k, True))
            want_c = list(imageops.project_open_lines(bw, k, False))
            got_r, got_c = imageops.detect_line_positions(img, k)
            assert list(got_r) == want_r, k
            assert list(got_c) == want_c, k
