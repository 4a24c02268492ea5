"""Spatial (H-axis) sharding with halo exchange == single-device ops,
on the fake 8-device CPU mesh (SURVEY.md section 2.2 SP analogue)."""

import numpy as np

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
