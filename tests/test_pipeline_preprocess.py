"""preprocess_page: uint8/float inputs, resize-to-canonical semantics."""

import numpy as np

import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.pipeline import preprocess_page


def test_preprocess_uint8_scales_and_resizes(rng):
    img = (rng.random((2, 300, 400, 3)) * 255).astype(np.uint8)
    out = preprocess_page(jnp.asarray(img), (64, 64))
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert 0.0 <= o.min() and o.max() <= 1.0 + 1e-6


def test_preprocess_float_passthrough_size(rng):
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    out = preprocess_page(jnp.asarray(img), (64, 64))
    np.testing.assert_array_equal(np.asarray(out), img)
