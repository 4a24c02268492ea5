"""Fused Pallas partial-conv kernel: parity vs the XLA implementation
(interpret mode on CPU; the compiled-kernel run happens on real TPU via
bench/verify), plus custom-VJP gradient checks vs XLA autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.ops.partial_conv import partial_conv2d
from text_segmentation_image_inpainting_tpu.ops.pallas.partial_conv_kernel import (
    partial_conv2d_pallas,
)

# interpret-mode pallas compiles take minutes on the 1-core host
pytestmark = pytest.mark.slow


def _data(rng, n=1, h=16, w=16, cin=8, cout=16, g_sizes=(8,), k=3):
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    m = (rng.random((n, h, w, len(g_sizes))) > 0.4).astype(np.float32)
    wk = (rng.standard_normal((k, k, cin, cout)) * 0.2).astype(np.float32)
    b = (rng.standard_normal((cout,)) * 0.2).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(m), jnp.asarray(wk), jnp.asarray(b)


@pytest.mark.parametrize("g_sizes", [(8,), (3, 5)])
def test_pallas_matches_xla_interpret(rng, g_sizes):
    x, m, wk, b = _data(rng, g_sizes=g_sizes)
    yx, mx = partial_conv2d(x, m, wk, b, group_sizes=g_sizes, padding=1, impl="xla")
    yp, mp = partial_conv2d_pallas(x, m, wk, b, g_sizes, (1, 1), (1, 1), (1, 1), True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))


def test_pallas_fully_masked_window(rng):
    x, _, wk, b = _data(rng)
    m = jnp.zeros((1, 16, 16, 1), jnp.float32)
    y, nm = partial_conv2d_pallas(x, m, wk, b, (8,), (1, 1), (1, 1), (1, 1), True)
    assert float(jnp.max(jnp.abs(y))) == 0.0
    assert float(jnp.sum(nm)) == 0.0


def test_pallas_odd_cout_no_padding_tile(rng):
    # cout=3 (the U-Net head): single unpadded Cout tile
    x, m, wk, b = _data(rng, cout=3)
    yx, _ = partial_conv2d(x, m, wk, b, padding=1, impl="xla")
    yp, _ = partial_conv2d_pallas(x, m, wk, b, (8,), (1, 1), (1, 1), (1, 1), True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), rtol=1e-5, atol=1e-5)


def test_pallas_cout_padding_path(rng):
    # cout=48 (>=32, not a 128 multiple): padded weights, sliced output
    x, m, wk, b = _data(rng, cout=48)
    yx, _ = partial_conv2d(x, m, wk, b, padding=1, impl="xla")
    yp, _ = partial_conv2d_pallas(x, m, wk, b, (8,), (1, 1), (1, 1), (1, 1), True)
    assert yp.shape[-1] == 48
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), rtol=1e-5, atol=1e-5)


def test_pallas_stride2_falls_back_to_xla(rng):
    x, m, wk, b = _data(rng)
    yx, mx = partial_conv2d(x, m, wk, b, padding=1, stride=2, impl="xla")
    yp, mp = partial_conv2d(x, m, wk, b, padding=1, stride=2, impl="pallas")
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))


@pytest.mark.parametrize("stride,bias", [(1, True), (2, True), (1, False)])
def test_custom_vjp_matches_xla_autodiff(rng, stride, bias):
    """The hand-written backward must match jax.grad through the XLA
    forward (which autodiffs the two-conv formulation)."""
    g_sizes = (3, 5)
    x, m, wk, b = _data(rng, h=12, w=12, g_sizes=g_sizes)
    if not bias:
        b = None

    def loss_xla(x, wk, b):
        y, _ = partial_conv2d(
            x, m, wk, b, group_sizes=g_sizes, padding=1, stride=stride, impl="xla"
        )
        return jnp.sum(jnp.sin(y))

    def loss_pallas(x, wk, b):
        y, _ = partial_conv2d_pallas(
            x, m, wk, b, g_sizes, (stride, stride), (1, 1), (1, 1), True
        )
        return jnp.sum(jnp.sin(y))

    args = (x, wk, b) if bias else (x, wk, None)
    if bias:
        gx1, gw1, gb1 = jax.grad(loss_xla, argnums=(0, 1, 2))(*args)
        gx2, gw2, gb2 = jax.grad(loss_pallas, argnums=(0, 1, 2))(*args)
        np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1), rtol=1e-4, atol=1e-5)
    else:
        gx1, gw1 = jax.grad(loss_xla, argnums=(0, 1))(x, wk, None)
        gx2, gw2 = jax.grad(loss_pallas, argnums=(0, 1))(x, wk, None)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1), rtol=1e-4, atol=1e-5)


def test_unet_pallas_impl_matches_xla_impl(rng):
    """Whole InpaintUNet with impl='pallas' == impl='xla' (decoder layers
    route through the kernel, encoder falls back)."""
    from text_segmentation_image_inpainting_tpu.models import InpaintUNet

    size = 16
    x = jnp.asarray(rng.standard_normal((1, size, size, 3)).astype(np.float32))
    m = jnp.asarray((rng.random((1, size, size, 1)) > 0.3).astype(np.float32))
    ref = InpaintUNet(depth=3, impl="xla")
    variables = jax.jit(ref.init)(jax.random.key(0), x * m, m)
    y_xla = ref.apply(variables, x * m, m)
    y_pl = InpaintUNet(depth=3, impl="pallas").apply(variables, x * m, m)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla), rtol=1e-4, atol=1e-4)
