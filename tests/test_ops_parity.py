"""Op-level parity vs the torch-CPU oracle (SURVEY.md section 4)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.ops import (
    conv2d,
    dilate_mask,
    partial_conv2d,
    resize_bilinear,
    upsample_nearest,
)
from tests.oracle.torch_ref import PartialConv2d


def nchw(x):  # np NHWC -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def nhwc(t):  # torch NCHW -> np NHWC
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.mark.parametrize("k,stride,pad,dil", [(3, 1, 1, 1), (5, 2, 2, 1), (7, 2, 3, 1), (3, 1, 2, 2)])
def test_conv2d_matches_torch(rng, k, stride, pad, dil):
    x = rng.standard_normal((2, 16, 16, 5), np.float32)
    w = rng.standard_normal((k, k, 5, 7), np.float32) * 0.2
    b = rng.standard_normal((7,), np.float32)
    got = conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=pad, dilation=dil, bias=jnp.asarray(b))
    want = F.conv2d(nchw(x), torch.from_numpy(np.moveaxis(w, (0, 1, 2, 3), (2, 3, 1, 0))),
                    torch.from_numpy(b), stride=stride, padding=pad, dilation=dil)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,bias", [(3, 1, True), (5, 2, True), (7, 2, False), (3, 2, True)])
def test_partial_conv_matches_oracle(rng, k, stride, bias):
    cin, cout = 5, 6
    x = rng.standard_normal((2, 17, 17, cin), np.float32)
    mask = (rng.random((2, 17, 17, 1)) > 0.4).astype(np.float32)
    ref = PartialConv2d(cin, cout, k, stride=stride, padding=k // 2, bias=bias)
    w = np.moveaxis(ref.conv.weight.detach().numpy(), (0, 1, 2, 3), (3, 2, 0, 1))  # OIHW->HWIO
    b = ref.conv.bias.detach().numpy() if bias else None
    got_y, got_m = partial_conv2d(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
        jnp.asarray(b) if b is not None else None,
        stride=stride, padding=k // 2,
    )
    want_y, want_m = ref(nchw(x), nchw(mask))
    np.testing.assert_allclose(np.asarray(got_y), nhwc(want_y), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_m), nhwc(want_m))


def test_partial_conv_fully_masked_window_is_zero(rng):
    """Windows with sum(M)==0 must output exactly 0 (even with bias)."""
    x = rng.standard_normal((1, 8, 8, 3), np.float32)
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[0, :2, :2, 0] = 1.0
    w = rng.standard_normal((3, 3, 3, 4), np.float32)
    b = rng.standard_normal((4,), np.float32)
    y, m = partial_conv2d(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w), jnp.asarray(b), padding=1)
    y, m = np.asarray(y), np.asarray(m)
    assert np.all(y[0, 5:, 5:] == 0.0)
    assert np.all(m[0, 5:, 5:] == 0.0)
    assert np.all(m[0, :3, :3] == 1.0)


def test_partial_conv_grouped_masks_match_per_channel(rng):
    """G=2 grouped masks == expanded per-channel masks (oracle path)."""
    c1, c2, cout = 3, 4, 5
    x = rng.standard_normal((1, 10, 10, c1 + c2), np.float32)
    m1 = (rng.random((1, 10, 10, 1)) > 0.5).astype(np.float32)
    m2 = (rng.random((1, 10, 10, 1)) > 0.5).astype(np.float32)
    ref = PartialConv2d(c1 + c2, cout, 3, padding=1)
    w = np.moveaxis(ref.conv.weight.detach().numpy(), (0, 1, 2, 3), (3, 2, 0, 1))
    b = ref.conv.bias.detach().numpy()
    got_y, got_m = partial_conv2d(
        jnp.asarray(x), jnp.asarray(np.concatenate([m1, m2], -1)), jnp.asarray(w),
        jnp.asarray(b), group_sizes=(c1, c2), padding=1,
    )
    mask_full = np.concatenate([np.repeat(m1, c1, -1), np.repeat(m2, c2, -1)], -1)
    want_y, want_m = ref(nchw(x), nchw(mask_full))
    np.testing.assert_allclose(np.asarray(got_y), nhwc(want_y), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_m), nhwc(want_m)[..., :1])


def test_resize_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 9, 13, 4), np.float32)
    for oh, ow, ac in [(18, 26, False), (17, 5, False), (18, 26, True), (4, 4, True)]:
        got = resize_bilinear(jnp.asarray(x), (oh, ow), align_corners=ac)
        want = F.interpolate(nchw(x), size=(oh, ow), mode="bilinear", align_corners=ac)
        np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 3), np.float32)
    got = upsample_nearest(jnp.asarray(x), 2)
    want = F.interpolate(nchw(x), scale_factor=2, mode="nearest")
    np.testing.assert_array_equal(np.asarray(got), nhwc(want))


def test_dilate_mask_matches_maxpool(rng):
    mask = (rng.random((1, 16, 16, 1)) > 0.9).astype(np.float32)
    got = dilate_mask(jnp.asarray(mask), radius=2)
    want = F.max_pool2d(nchw(mask), kernel_size=5, stride=1, padding=2)
    np.testing.assert_array_equal(np.asarray(got), nhwc(want))
    # idempotent on all-ones, no-op on radius 0
    np.testing.assert_array_equal(np.asarray(dilate_mask(jnp.asarray(mask), 0)), mask)


def test_erode_mask_matches_minpool(rng):
    from text_segmentation_image_inpainting_tpu.ops.morphology import erode_mask

    mask = (rng.random((1, 16, 16, 1)) > 0.3).astype(np.float32)
    got = erode_mask(jnp.asarray(mask), radius=1)
    want = -F.max_pool2d(-nchw(mask), kernel_size=3, stride=1, padding=1)
    np.testing.assert_array_equal(np.asarray(got), nhwc(want))


def test_textsegament_alias():
    """Reference API spelling: TextSegament is the same class."""
    from text_segmentation_image_inpainting_tpu.models import TextSegament, TextSegmenter

    assert TextSegament is TextSegmenter
