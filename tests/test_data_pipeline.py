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


def test_prefetcher_propagates_worker_exception():
    """A dead worker (e.g. corrupt image raising in decode) must surface
    the exception in __next__, not deadlock the consumer."""
    import pytest

    def bad_iter():
        yield {"x": np.zeros((2, 4, 4, 3), np.float32)}
        raise ValueError("corrupt image")

    pf = DevicePrefetcher(bad_iter())
    next(pf)  # first batch is fine
    with pytest.raises(ValueError, match="corrupt image"):
        next(pf)
    pf.close()


def test_load_base_aspect_preserving(tmp_path):
    """Undersized disk images are upscaled aspect-preserving (no stretch)
    before the random crop."""
    from PIL import Image

    # 100x20 wide strip with a horizontal gradient; a distorting resize
    # to 64x64 would change the gradient's pixel pitch non-uniformly
    arr = np.zeros((20, 100, 3), np.uint8)
    arr[..., 0] = np.linspace(0, 255, 100, dtype=np.uint8)[None, :]
    p = tmp_path / "strip.png"
    Image.fromarray(arr).save(p)
    src = PageSource(kind="seg", size=(64, 64), seed=0, paths=[str(p)])
    base = src._load_base(np.random.default_rng(0))
    assert base.shape == (64, 64, 3)
    # aspect-preserving x-scale is 320/100 = 3.2 (driven by height 20->64),
    # so a 64-wide crop spans <= 64/3.2 = 20 source columns => the red
    # gradient inside the crop spans at most ~20/100 of the full range
    spread = base[..., 0].max() - base[..., 0].min()
    assert spread <= 0.25, spread
