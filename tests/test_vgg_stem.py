"""Parity tests for the fused VGG stem-tail Pallas kernel (vgg_stem.py).

The kernel is recorded infrastructure (not wired into VGG16Features):
the measured platform HBM bandwidth (~155-190 GB/s, docs/KERNEL_NOTES.md
round 3 cont.) puts XLA's stock conv+pool stem already at the roofline,
so the fusion cannot win on this chip. Parity is kept green so the
kernel is usable the day a higher-bandwidth part appears.
"""

import jax
import jax.numpy as jnp
import pytest

from text_segmentation_image_inpainting_tpu.ops.pallas.vgg_stem import (
    PADW,
    pack_rows,
    stem_pool_packed,
    stem_pool_reference,
    unpack_rows,
)

# interpret-mode pallas compiles take minutes on the 1-core host
pytestmark = pytest.mark.slow


def _mk(h, w, n=2, dtype=jnp.float32, seed=0):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    z0 = jax.random.normal(kx, (n, h, w, 64), dtype)
    w1 = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32) * 0.05
    b1 = jax.random.normal(kb, (64,), jnp.float32) * 0.1
    return z0, w1, b1


def test_pack_unpack_roundtrip():
    z0, _, _ = _mk(64, 64)
    zp = pack_rows(z0)
    assert zp.shape == (2, 34, 64 + 2 * PADW, 128)
    assert jnp.array_equal(unpack_rows(zp), z0)
    # halo rows and column pad are zero
    assert float(jnp.abs(zp[:, 0]).max()) == 0.0
    assert float(jnp.abs(zp[:, -1]).max()) == 0.0
    assert float(jnp.abs(zp[:, :, :PADW]).max()) == 0.0
    assert float(jnp.abs(zp[:, :, -PADW:]).max()) == 0.0


@pytest.mark.parametrize("h,w", [(64, 64), (32, 48), (16, 16)])
def test_stem_pool_matches_reference(h, w):
    z0, w1, b1 = _mk(h, w)
    ref = stem_pool_reference(z0, w1, b1)
    got = stem_pool_packed(pack_rows(z0), w1, b1, interpret=True)
    assert got.shape == ref.shape == (2, h // 2, w // 2, 64)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-5


def test_stem_pool_bf16():
    z0, w1, b1 = _mk(32, 32, dtype=jnp.bfloat16, seed=1)
    ref = stem_pool_reference(z0, w1, b1).astype(jnp.float32)
    got = stem_pool_packed(pack_rows(z0), w1, b1, interpret=True).astype(jnp.float32)
    # bf16 compute, fp32 accumulation in both paths; tolerance for
    # accumulation-order differences
    assert float(jnp.max(jnp.abs(got - ref))) < 0.05


def test_negative_inputs_relu_path():
    # all-negative z0: relu zeroes everything -> output = pool(relu(b))
    _, w1, b1 = _mk(32, 32, seed=2)
    z0 = -jnp.ones((1, 32, 32, 64), jnp.float32)
    ref = stem_pool_reference(z0, w1, b1)
    got = stem_pool_packed(pack_rows(z0), w1, b1, interpret=True)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_packed_producer_equivalence():
    """conv0 as two stride-(2,1) convs + lane concat == pack_rows(conv0)."""
    from jax import lax

    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.uniform(kx, (2, 64, 64, 3), jnp.float32)
    w0 = jax.random.normal(kw, (3, 3, 3, 64), jnp.float32) * 0.1
    dn = ("NHWC", "HWIO", "NHWC")
    stock = lax.conv_general_dilated(x, w0, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
    even = lax.conv_general_dilated(x, w0, (2, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=dn)
    odd = lax.conv_general_dilated(x, w0, (2, 1), ((0, 2), (1, 1)),
                                   dimension_numbers=dn)
    packed = jnp.pad(jnp.concatenate([even, odd], axis=-1),
                     ((0, 0), (1, 1), (PADW, PADW), (0, 0)))
    assert float(jnp.max(jnp.abs(packed - pack_rows(stock)))) < 1e-5
