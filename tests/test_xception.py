"""Xception backbone + DeepLab ASPP head — the reference's alternative
encoder experiment track (SURVEY.md section 2.1 extras [R-low]).

Encoder and xception-backboned segmenter are verified against the
torch-CPU oracle at identical weights (same bar as MobileNetV2); the
DeepLab-v3+ head — this framework's extension built from the
oracle-covered ConvBNAct primitive — is verified structurally
(geometry, gradient flow, train smoke).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.compat.torch_import import (
    import_text_segmenter,
    import_xception_encoder,
)
from text_segmentation_image_inpainting_tpu.models import TextSegmenter, XceptionEncoder
from text_segmentation_image_inpainting_tpu.models.base import tolerant_merge
from tests.oracle import torch_ref


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def strict_merge(template, imported):
    merged, report = tolerant_merge(template, imported)
    assert not report["skipped_shape"], report["skipped_shape"][:5]
    assert not report["skipped_missing"], report["skipped_missing"][:5]
    assert not report["unfilled"], report["unfilled"][:5]
    return merged


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
@pytest.mark.parametrize("output_stride", [8, 16])
def test_xception_encoder_taps_match_oracle(output_stride):
    torch.manual_seed(1)
    wm, reps = 0.25, 2
    ref = torch_ref.XceptionEncoder(
        width_mult=wm, output_stride=output_stride, middle_repeats=reps
    ).eval()
    enc = XceptionEncoder(width_mult=wm, output_stride=output_stride, middle_repeats=reps)
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    template = jax.jit(enc.init)(jax.random.key(0), jnp.asarray(x))
    variables = strict_merge(
        template, import_xception_encoder(ref.state_dict(), middle_repeats=reps)
    )
    got = jax.jit(enc.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        want = ref(torch.from_numpy(np.moveaxis(x, -1, 1)))
    for k in ("s2", "s4", "out"):
        np.testing.assert_allclose(
            np.asarray(got[k]), to_nhwc(want[k]), rtol=1e-3, atol=1e-4, err_msg=k
        )
    assert got["s2"].shape[1] == 32 and got["s4"].shape[1] == 16
    assert got["out"].shape[1] == 64 // output_stride
    assert got["out"].shape[-1] == enc.out_channels


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_xception_segmenter_matches_oracle():
    torch.manual_seed(2)
    ref = torch_ref.TextSegmenter(
        width_mult=0.25, output_stride=8, backbone="xception"
    ).eval()
    # oracle uses middle_repeats=8 (its default) — match it here
    model = TextSegmenter(width_mult=0.25, output_stride=8, backbone="xception")
    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3)).astype(np.float32)
    template = jax.jit(model.init)(jax.random.key(0), jnp.asarray(x))
    variables = strict_merge(
        template, import_text_segmenter(ref.state_dict(), backbone="xception")
    )
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x, -1, 1))))
    assert got.shape == want.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
@pytest.mark.parametrize("backbone", ["mobilenet_v2", "xception"])
def test_deeplab_head_geometry_and_grad(backbone):
    model = TextSegmenter(width_mult=0.25, backbone=backbone, head="deeplab")
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.key(1), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 64, 64, 1)

    def loss(p):
        y = model.apply({**variables, "params": p}, x)
        return jnp.mean(y**2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # the ASPP image-pool branch must receive gradient (global context live)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    pool_grads = [v for k, v in flat if any("image_pool" in str(p) for p in k)]
    assert pool_grads and any(float(jnp.abs(v).max()) > 0 for v in pool_grads)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_xception_seg_train_smoke():
    """A few SGD steps on one batch must reduce the seg loss (same smoke
    bar as the MobileNetV2 path in test_train_and_pipeline.py)."""
    import optax

    from text_segmentation_image_inpainting_tpu.losses.segmentation import (
        segmentation_loss,
    )

    model = TextSegmenter(width_mult=0.25, backbone="xception", head="deeplab")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.9).astype(np.float32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(2), x, train=True
    )
    params, batch_stats = variables["params"], variables.get("batch_stats")
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            l, _ = segmentation_loss(out, y)
            return l, upd["batch_stats"]

        (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), bs, opt, l

    losses = []
    for _ in range(5):
        params, batch_stats, opt, l = step(params, batch_stats, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses
