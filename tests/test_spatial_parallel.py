"""Spatial (H-axis) sharding with halo exchange == single-device ops,
on the fake 8-device CPU mesh (SURVEY.md section 2.2 SP analogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.ops.conv import conv2d
from text_segmentation_image_inpainting_tpu.ops.partial_conv import partial_conv2d
from text_segmentation_image_inpainting_tpu.parallel import batch_sharding, make_mesh
from text_segmentation_image_inpainting_tpu.parallel.spatial import (
    spatial_conv2d,
    spatial_partial_conv2d,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def test_spatial_conv_matches_single_device(rng):
    mesh = make_mesh(8, platform="cpu")
    x = jnp.asarray(rng.standard_normal((2, 64, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))
    want = conv2d(x, w, stride=1, padding=1, bias=b)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None, None)))
    got = spatial_conv2d(mesh, xs, w, b)
    assert got.sharding.spec == P(None, "data", None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatial_partial_conv_stride2_matches_single_device(rng):
    """Halo-exchange through a stride-2 pconv (encoder shape), k in {3,5,7}."""
    mesh = make_mesh(8, platform="cpu")
    sh = NamedSharding(mesh, P(None, "data", None, None))
    from functools import partial

    from jax.experimental.shard_map import shard_map

    from text_segmentation_image_inpainting_tpu.ops.partial_conv import spatial_axis

    for k in (3, 5, 7):
        x = jnp.asarray(rng.standard_normal((1, 64, 16, 6)).astype(np.float32))
        m = jnp.asarray((rng.random((1, 64, 16, 1)) > 0.4).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, k, 6, 4)).astype(np.float32) * 0.2)
        want_y, want_m = partial_conv2d(x, m, w, stride=2, padding=k // 2)

        def local(x, m, w):
            with spatial_axis("data"):
                return partial_conv2d(x, m, w, stride=2, padding=k // 2)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(None, "data", None, None), P(None, "data", None, None), P()),
            out_specs=(P(None, "data", None, None), P(None, "data", None, None)),
        )
        got_y, got_m = fn(jax.device_put(x, sh), jax.device_put(m, sh), w)
        np.testing.assert_allclose(
            np.asarray(got_y), np.asarray(want_y), rtol=1e-5, atol=1e-5,
            err_msg=f"k={k}",
        )
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_spatial_inpaint_unet_matches_single_device(rng):
    """The UNMODIFIED InpaintUNet forward, H-sharded over 8 devices via
    the spatial_axis context, == single-device (VERDICT round-1 item 5)."""
    from text_segmentation_image_inpainting_tpu.models import InpaintUNet
    from text_segmentation_image_inpainting_tpu.parallel.spatial import (
        spatial_inpaint_unet,
    )

    mesh = make_mesh(8, platform="cpu")
    unet = InpaintUNet(depth=3, fuse_up=False)
    x = jnp.asarray(rng.standard_normal((1, 64, 32, 3)).astype(np.float32))
    m = jnp.asarray((rng.random((1, 64, 32, 1)) > 0.25).astype(np.float32))
    variables = jax.jit(unet.init)(jax.random.key(0), x * m, m)
    want = unet.apply(variables, x * m, m)
    sh = NamedSharding(mesh, P(None, "data", None, None))
    got = spatial_inpaint_unet(
        mesh, unet, variables, jax.device_put(x * m, sh), jax.device_put(m, sh)
    )
    assert got.sharding.spec == P(None, "data", None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_spatial_pipeline_gspmd_matches_single_device(rng):
    """Whole fused pipeline H-sharded via GSPMD annotation == unsharded."""
    from text_segmentation_image_inpainting_tpu.models import InpaintUNet, TextSegmenter
    from text_segmentation_image_inpainting_tpu.parallel.spatial import (
        spatial_pipeline_run,
    )
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline

    mesh = make_mesh(8, platform="cpu")
    # small fp32 config: depth-5 U-Net (multiple 32), 64^2 pages
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35),
        unet=InpaintUNet(depth=5),
        compute_dtype=jnp.float32,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(64, 64))
    pages = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    want_clean, want_mask = jax.jit(pipe.run)(seg_vars, unet_vars, pages)
    got_clean, got_mask = spatial_pipeline_run(mesh, pipe, seg_vars, unet_vars, pages)
    assert got_clean.sharding.spec == P(None, "data", None, None)
    np.testing.assert_array_equal(np.asarray(got_clean), np.asarray(want_clean))
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))


def test_spatial_partial_conv_matches_single_device(rng):
    mesh = make_mesh(8, platform="cpu")
    x = jnp.asarray(rng.standard_normal((1, 64, 16, 6)).astype(np.float32))
    m = jnp.asarray((rng.random((1, 64, 16, 2)) > 0.4).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    want_y, want_m = partial_conv2d(x, m, w, b, group_sizes=(2, 4), padding=1)
    sh = NamedSharding(mesh, P(None, "data", None, None))
    got_y, got_m = spatial_partial_conv2d(
        mesh, jax.device_put(x, sh), jax.device_put(m, sh), w, b, group_sizes=(2, 4)
    )
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_spatial_gspmd_fused_512_compiles_with_halo_collectives():
    """VERDICT r2 weak #3: the PRODUCTION (phase-fused, bf16) pipeline
    H-sharded at full 8x512^2 geometry. AOT lower+compile on the
    8-device mesh — no 512^2 CPU execution — then inspect the SPMD HLO:
    the partitioner must stitch shard seams with collective-permute
    (neighbor halo traffic), not full-activation all-gathers."""
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline

    mesh = make_mesh(8, platform="cpu")
    pipe = TextRemovalPipeline()  # production config: fuse_up=True, bf16
    assert pipe.unet.fuse_up

    key = jax.random.key(0)
    x1 = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.bfloat16)
    m1 = jax.ShapeDtypeStruct((1, 512, 512, 1), jnp.bfloat16)
    seg_shapes = jax.eval_shape(pipe.seg.init, key, x1)
    unet_shapes = jax.eval_shape(pipe.unet.init, key, x1, m1)

    sh = NamedSharding(mesh, P(None, "data", None, None))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(pipe.run, in_shardings=(rep, rep, sh), out_shardings=(sh, sh))
    pages = jax.ShapeDtypeStruct((8, 512, 512, 3), jnp.float32)
    compiled = fn.lower(seg_shapes, unet_shapes, pages).compile()
    hlo = compiled.as_text()

    n_cp = hlo.count(" collective-permute(")
    n_ag = hlo.count(" all-gather(")
    # halo exchange exists...
    assert n_cp > 0, "no collective-permute: H sharding didn't partition the convs"
    # ...and dominates: a handful of all-gathers (e.g. logit-threshold
    # reductions) are fine, but the conv stack must NOT be stitched by
    # re-gathering full activations
    assert n_ag <= n_cp, (n_ag, n_cp)
