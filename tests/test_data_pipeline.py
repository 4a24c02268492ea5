"""Data path: synthetic sources, grain pipeline, native rasterizer,
device prefetcher (SURVEY.md C10)."""

import numpy as np

import jax

from text_segmentation_image_inpainting_tpu.data import native_masks
from text_segmentation_image_inpainting_tpu.data.masks import (
    random_hole_mask,
    random_rect_mask,
    random_stroke_mask,
)
from text_segmentation_image_inpainting_tpu.data.pipeline import (
    DevicePrefetcher,
    PageSource,
    make_dataset,
)
from text_segmentation_image_inpainting_tpu.data.text_overlay import (
    overlay_text,
    segmentation_sample,
    synthetic_page,
)

SIZE = (64, 64)


def test_synthetic_page_and_overlay(rng):
    page = synthetic_page(rng, SIZE)
    assert page.shape == (64, 64, 3) and page.dtype == np.float32
    assert 0.0 <= page.min() and page.max() <= 1.0
    img, mask = overlay_text(page, rng)
    assert img.shape == (64, 64, 3) and mask.shape == (64, 64, 1)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # text must actually be rendered and change the image under the mask
    assert mask.sum() > 0
    assert not np.allclose(img * mask, page * mask)


def test_mask_generators(rng):
    for gen in (random_stroke_mask, random_rect_mask, random_hole_mask):
        m = gen(rng, SIZE)
        assert m.shape == (64, 64, 1)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        # holes exist but never consume the whole page (defaults are sized
        # for 512^2, so at 64^2 the valid fraction can be small)
        assert 0.0 < m.mean() < 1.0


def test_native_masks_match_numpy_statistics():
    seeds = np.arange(8, dtype=np.uint64)
    masks = native_masks.random_hole_masks(seeds, SIZE)
    assert masks.shape == (8, 64, 64, 1)
    assert set(np.unique(masks)).issubset({0.0, 1.0})
    # deterministic per seed
    again = native_masks.random_hole_masks(seeds, SIZE)
    np.testing.assert_array_equal(masks, again)
    # different seeds -> different masks
    assert not np.array_equal(masks[0], masks[1])


def test_page_source_deterministic():
    src = PageSource(kind="seg", size=SIZE, seed=7)
    a, b = src[3], src[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    c = src[4]
    assert not np.array_equal(a["image"], c["image"])
    inp = PageSource(kind="inpaint", size=SIZE, seed=7)[0]
    assert inp["image"].shape == (64, 64, 3) and inp["mask"].shape == (64, 64, 1)


def test_make_dataset_batches_and_prefetcher():
    it = make_dataset("seg", batch_size=2, size=SIZE, seed=0)
    batch = next(it)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["mask"].shape == (2, 64, 64, 1)

    pf = DevicePrefetcher(iter([batch, batch]))
    out = next(pf)
    assert isinstance(out["image"], jax.Array)
    assert out["image"].shape == (2, 64, 64, 3)
    pf.close()
