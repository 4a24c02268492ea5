"""Tests for the native C++ synthetic page engine (data/native/pagegen.cpp).

Native samples are statistically equivalent to the PIL path (same
geometry/parameter distributions, same glyph atlas), not bit-identical
(different RNG streams) — so tests check semantics, determinism, and
distribution sanity rather than pixel equality with PIL.
"""

import numpy as np
import pytest

from text_segmentation_image_inpainting_tpu.data import native_pages
from text_segmentation_image_inpainting_tpu.data.pipeline import make_page_stream_u8
from text_segmentation_image_inpainting_tpu.data.text_overlay import (
    inpainting_sample,
    segmentation_sample,
)

requires_native = pytest.mark.skipif(
    not native_pages.available(), reason="no C++ toolchain for pagegen"
)


@requires_native
def test_shapes_dtypes_and_determinism():
    img, mask = native_pages.synth_pages_u8([1, 2, 3], (128, 96))
    assert img.shape == (3, 128, 96, 3) and img.dtype == np.uint8
    assert mask.shape == (3, 128, 96, 1) and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 1}
    img2, mask2 = native_pages.synth_pages_u8([1, 2, 3], (128, 96))
    assert np.array_equal(img, img2) and np.array_equal(mask, mask2)
    # different seeds give different pages
    img3, _ = native_pages.synth_pages_u8([4, 5, 6], (128, 96))
    assert not np.array_equal(img, img3)


@requires_native
def test_seg_composites_text_inpaint_does_not():
    seeds = [7, 8]
    seg_img, seg_m = native_pages.synth_pages_u8(seeds, (256, 256), mode="seg")
    inp_img, inp_m = native_pages.synth_pages_u8(seeds, (256, 256), mode="inpaint")
    # same RNG stream -> same page and same text mask
    assert np.array_equal(seg_m, inp_m)
    off = seg_m[..., 0] == 0
    assert np.array_equal(seg_img[off], inp_img[off])
    # text pixels carry one of the 4 quantized text colors, grayscale
    on = seg_m[..., 0] == 1
    if on.any():
        vals = np.unique(seg_img[on])
        assert set(vals.tolist()) <= {0, 20, 38, 255}


@requires_native
def test_text_coverage_sane():
    _, mask = native_pages.synth_pages_u8(range(16), (512, 512))
    cov = mask.mean()
    # a few glyph runs on a 512^2 page: strictly between "blank" and "half ink"
    assert 5e-4 < cov < 0.2, cov


@requires_native
def test_f32_sample_wrappers():
    rng = np.random.default_rng(0)
    img, mask = native_pages.segmentation_sample_native(rng, (128, 128))
    assert img.shape == (128, 128, 3) and img.dtype == np.float32
    assert mask.shape == (128, 128, 1) and mask.dtype == np.float32
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0


def test_dispatchers_native_and_pil_agree_on_api():
    rng = np.random.default_rng(1)
    for fn in (segmentation_sample, inpainting_sample):
        a_img, a_mask = fn(rng, (64, 64), native=False)  # PIL reference
        b_img, b_mask = fn(rng, (64, 64))  # auto (native when available)
        assert a_img.shape == b_img.shape == (64, 64, 3)
        assert a_mask.shape == b_mask.shape == (64, 64, 1)
        assert a_img.dtype == b_img.dtype == np.float32
        assert a_mask.dtype == b_mask.dtype == np.float32


def test_page_stream_u8_format_and_determinism():
    it1 = make_page_stream_u8(batch_size=2, size=(64, 64), seed=3)
    it2 = make_page_stream_u8(batch_size=2, size=(64, 64), seed=3)
    b1, b2 = next(it1), next(it2)
    assert b1["image"].shape == (2, 64, 64, 3)
    assert b1["image"].dtype == np.uint8
    if native_pages.available():
        assert np.array_equal(b1["image"], b2["image"])
