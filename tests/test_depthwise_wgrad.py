"""Parity tests for the Pallas depthwise weight-gradient path.

The custom path must be numerically invisible: identical parameter
trees, identical forward values, and gradients matching XLA's own
depthwise-conv VJP (which is the correctness oracle here — the Pallas
kernel only changes the lowering, never the math). Runs in Pallas
interpret mode on the CPU test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import text_segmentation_image_inpainting_tpu.ops.depthwise as dwise
from text_segmentation_image_inpainting_tpu.ops.conv import conv2d
from text_segmentation_image_inpainting_tpu.ops.pallas.depthwise_wgrad import (
    depthwise_wgrad,
)

# interpret-mode pallas compiles take minutes on the 1-core host
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _restore_flag():
    prev = dwise.USE_CUSTOM_WGRAD
    yield
    dwise.USE_CUSTOM_WGRAD = prev


@pytest.mark.parametrize(
    "n,h,w,c,k,d",
    [
        (2, 16, 16, 128, 3, 1),
        (1, 24, 20, 160, 3, 2),  # channel padding (160 -> 256 lanes)
        (2, 9, 13, 192, 3, 4),  # odd spatial sizes, d=4
        (1, 8, 8, 128, 5, 1),  # k=5
    ],
)
def test_wgrad_kernel_matches_xla_vjp(rng, n, h, w, c, k, d):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, 1, c)).astype(np.float32))
    p = d * (k - 1) // 2
    _, vjp = jax.vjp(
        lambda kk: conv2d(x, kk, stride=1, padding=p, dilation=d, groups=c), kern
    )
    dw_ref = vjp(dy)[0]
    dw = depthwise_wgrad(x, dy, k, d, interpret=True)
    err = float(jnp.max(jnp.abs(dw - dw_ref)) / (jnp.max(jnp.abs(dw_ref)) + 1e-9))
    assert err < 1e-5, err


def test_depthwise_conv2d_custom_vjp_full_parity(rng):
    c = 128
    x = jnp.asarray(rng.normal(size=(2, 12, 12, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32))

    def ref(x_, k_):
        return conv2d(x_, k_, stride=1, padding=1, dilation=1, groups=c)

    y = dwise.depthwise_conv2d(x, kern, 1, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref(x, kern)))

    g = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    dx, dw = jax.vjp(lambda a, b: dwise.depthwise_conv2d(a, b, 1, True), x, kern)[1](g)
    dx_ref, dw_ref = jax.vjp(ref, x, kern)[1](g)
    for got, want in [(dx, dx_ref), (dw, dw_ref)]:
        err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
        assert err < 1e-5, err


def test_encoder_param_tree_and_grads_match_nn_conv(rng):
    """Flag on/off: same init tree, same forward, matching gradients."""
    from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
        MobileNetV2Encoder,
    )

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    enc = MobileNetV2Encoder(dtype=jnp.float32)

    dwise.USE_CUSTOM_WGRAD = True
    v_on = enc.init(jax.random.key(0), x)
    dwise.USE_CUSTOM_WGRAD = False
    v_off = enc.init(jax.random.key(0), x)
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: jnp.array_equal(a, b), v_on, v_off)
    )

    def loss(variables, flag):
        dwise.USE_CUSTOM_WGRAD = flag
        taps = enc.apply(variables, x, train=False)
        return sum(jnp.sum(t**2) for t in taps.values())

    g_on = jax.grad(lambda v: loss(v, True))(v_on)
    g_off = jax.grad(lambda v: loss(v, False))(v_on)
    errs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)),
        g_on,
        g_off,
    )
    worst = max(jax.tree_util.tree_leaves(errs))
    assert worst < 2e-5, worst
