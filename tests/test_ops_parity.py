"""Op-level parity vs the torch-CPU oracle (SURVEY.md section 4)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
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


class TestFusedUp2AndS2D:
    """The decoder's fused half-res phase conv and the stride-2 s2d stem
    must match the literal composition exactly (same params)."""

    def _up2_case(self, rng, N=2, Hh=8, Wh=6, C_lo=5, C_skip=7, Cout=4):
        from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
            partial_conv2d,
        )
        from text_segmentation_image_inpainting_tpu.ops.resize import upsample_nearest

        f_lo = jnp.asarray(rng.standard_normal((N, Hh, Wh, C_lo)).astype(np.float32))
        m_lo = jnp.asarray((rng.random((N, Hh, Wh, 1)) > 0.4).astype(np.float32))
        sf = jnp.asarray(rng.standard_normal((N, 2 * Hh, 2 * Wh, C_skip)).astype(np.float32))
        sm = jnp.asarray((rng.random((N, 2 * Hh, 2 * Wh, 1)) > 0.4).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((3, 3, C_lo + C_skip, Cout)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32))

        def ref(W):
            cf = jnp.concatenate([upsample_nearest(f_lo, 2), sf], axis=-1)
            cm = jnp.concatenate([upsample_nearest(m_lo, 2), sm], axis=-1)
            return partial_conv2d(cf, cm, W, b, group_sizes=(C_lo, C_skip), padding=1)

        return f_lo, m_lo, sf, sm, W, b, ref

    def test_up2_forward_and_mask(self, rng):
        from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
            partial_conv2d_up2,
        )

        f_lo, m_lo, sf, sm, W, b, ref = self._up2_case(rng)
        want_y, want_m = jax.jit(ref)(W)
        got_y, got_m = jax.jit(lambda W: partial_conv2d_up2(f_lo, m_lo, sf, sm, W, b))(W)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))

    def test_up2_s2d_io_variant(self, rng):
        from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
            depth_to_space,
            partial_conv2d_up2,
            space_to_depth,
        )

        f_lo, m_lo, sf, sm, W, b, ref = self._up2_case(rng)
        want_y, want_m = jax.jit(ref)(W)
        got_y, got_m = jax.jit(
            lambda W: partial_conv2d_up2(
                f_lo, m_lo, space_to_depth(sf), space_to_depth(sm), W, b,
                skip_s2d=True, out_s2d=True,
            )
        )(W)
        np.testing.assert_allclose(
            np.asarray(depth_to_space(got_y)), np.asarray(want_y), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(depth_to_space(got_m)), np.asarray(want_m))

    def test_up2_weight_gradient(self, rng):
        from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
            partial_conv2d_up2,
        )

        f_lo, m_lo, sf, sm, W, b, ref = self._up2_case(rng)
        g_ref = jax.grad(lambda W: jnp.sum(jnp.sin(ref(W)[0])))(W)
        g_new = jax.grad(
            lambda W: jnp.sum(jnp.sin(partial_conv2d_up2(f_lo, m_lo, sf, sm, W, b)[0]))
        )(W)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k", [3, 5, 7])
    def test_s2d_stride2_stem(self, rng, k):
        from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
            partial_conv2d,
            partial_conv2d_s2d,
            space_to_depth,
        )

        x = jnp.asarray(rng.standard_normal((2, 16, 12, 3)).astype(np.float32))
        m = jnp.asarray((rng.random((2, 16, 12, 1)) > 0.4).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((k, k, 3, 8)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
        want_y, want_m = jax.jit(
            lambda x, m: partial_conv2d(x, m, W, b, stride=2, padding=k // 2)
        )(x, m)
        got_y, got_m = jax.jit(lambda x, m: partial_conv2d_s2d(x, m, W, b))(x, m)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
        got_y2, _ = jax.jit(
            lambda x, m: partial_conv2d_s2d(x, m, W, b, input_s2d=True)
        )(space_to_depth(x), space_to_depth(m))
        np.testing.assert_allclose(np.asarray(got_y2), np.asarray(want_y), rtol=1e-5, atol=1e-5)

    def test_unet_fused_unfused_and_s2d_io_agree(self, rng):
        from text_segmentation_image_inpainting_tpu.models import InpaintUNet
        from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
            depth_to_space,
            space_to_depth,
        )

        size = 32
        x = jnp.asarray(rng.standard_normal((2, size, size, 3)).astype(np.float32))
        mask = jnp.asarray((rng.random((2, size, size, 1)) > 0.3).astype(np.float32))
        fused = InpaintUNet(depth=4, fuse_min_hw=0)  # force fusion at 32^2
        unfused = InpaintUNet(depth=4, fuse_up=False)
        v = jax.jit(fused.init)(jax.random.key(0), x * mask, mask)
        a = jax.jit(fused.apply)(v, x * mask, mask)
        b = jax.jit(unfused.apply)(v, x * mask, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
        c = depth_to_space(
            jax.jit(lambda v, p, m: fused.apply(v, p, m, io_s2d=True))(
                v, space_to_depth(x), space_to_depth(mask)
            )
        )
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-4)


def test_up2_bf16_mask_counts_exact(rng):
    """bf16 fused up2 must carry EXACT window counts: raw per-bank tap
    counts (<= 9) ride the GEMM and the c_lo/c_skip weighting happens in
    f32. The old weighted-count form rounded values like 64*9 + 3*9 in
    the bf16 conv output (~0.39% renorm skew on top of the ~0.44%
    feature rounding at this seed; this bound catches a regression)."""
    from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
        partial_conv2d,
        partial_conv2d_up2,
    )
    from text_segmentation_image_inpainting_tpu.ops.resize import upsample_nearest

    r = np.random.default_rng(0)
    n, hh, wh, c_lo, c_skip, cout = 2, 16, 16, 64, 3, 8  # RGB-skip head level
    f_lo = r.standard_normal((n, hh, wh, c_lo)).astype(np.float32)
    m_lo = (r.random((n, hh, wh, 1)) > 0.4).astype(np.float32)
    sf = r.standard_normal((n, 2 * hh, 2 * wh, c_skip)).astype(np.float32)
    sm = (r.random((n, 2 * hh, 2 * wh, 1)) > 0.4).astype(np.float32)
    w = (r.standard_normal((3, 3, c_lo + c_skip, cout)) * 0.1).astype(np.float32)
    b = r.standard_normal((cout,)).astype(np.float32)

    cat_f = jnp.concatenate([upsample_nearest(jnp.asarray(f_lo), 2), jnp.asarray(sf)], -1)
    cat_m = jnp.concatenate([upsample_nearest(jnp.asarray(m_lo), 2), jnp.asarray(sm)], -1)
    ref, refm = partial_conv2d(
        cat_f, cat_m, jnp.asarray(w), jnp.asarray(b),
        group_sizes=(c_lo, c_skip), padding=1,
    )
    ref = np.asarray(ref, np.float32)

    y, m = jax.jit(
        lambda: partial_conv2d_up2(
            jnp.asarray(f_lo, jnp.bfloat16), jnp.asarray(m_lo),
            jnp.asarray(sf, jnp.bfloat16), jnp.asarray(sm),
            jnp.asarray(w, jnp.bfloat16), jnp.asarray(b),
        )
    )()
    rel = np.abs(np.asarray(y, np.float32) - ref).max() / np.abs(ref).max()
    assert rel < 0.0055, f"bf16 fused up2 error {rel:.4%} — count path no longer exact?"
    np.testing.assert_array_equal(np.asarray(m, np.float32), np.asarray(refm, np.float32))
