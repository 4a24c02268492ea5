"""Loss-suite parity vs torch formulations (SURVEY.md section 4).

Seg losses check against ``torch.nn.functional`` references; the
inpainting bundle checks each term against an independently-written
torch mirror driven through the torch-oracle VGG with shared weights.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.compat.torch_import import import_vgg16_features
from text_segmentation_image_inpainting_tpu.losses import (
    bce_with_logits,
    dice_loss,
    focal_loss,
    gram_matrix,
    inpainting_loss,
    total_variation_loss,
)
from text_segmentation_image_inpainting_tpu.losses.inpainting import InpaintLossConfig
from text_segmentation_image_inpainting_tpu.models import VGG16Features
from tests.oracle import torch_ref


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 8, 1)).astype(np.float32) * 3
    targets = (rng.random((2, 8, 8, 1)) > 0.7).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(
        F.binary_cross_entropy_with_logits(torch.from_numpy(logits), torch.from_numpy(targets))
    )
    assert abs(got - want) < 1e-6

    got_pw = float(
        bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), pos_weight=3.0)
    )
    want_pw = float(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets),
            pos_weight=torch.tensor(3.0),
        )
    )
    assert abs(got_pw - want_pw) < 1e-6


def test_dice_loss_properties(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 1)).astype(np.float32))
    big = 50.0
    targets = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    # perfect prediction (saturated logits) -> dice ~ 0
    assert float(dice_loss(jnp.where(targets > 0, big, -big), targets)) < 1e-3
    # inverted prediction -> dice ~ 1 (eps=1 smoothing caps it below 1)
    assert float(dice_loss(jnp.where(targets > 0, -big, big), targets)) > 0.95


def test_focal_matches_manual_torch(rng):
    logits = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    targets = (rng.random((2, 8, 8, 1)) > 0.7).astype(np.float32)
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=2.0, alpha=0.25))
    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    a_t = 0.25 * tt + 0.75 * (1 - tt)
    want = float((a_t * (1 - p_t) ** 2 * ce).mean())
    assert abs(got - want) < 1e-6


def test_gram_matrix_matches_torch(rng):
    f = rng.standard_normal((2, 6, 5, 7)).astype(np.float32)
    got = np.asarray(gram_matrix(jnp.asarray(f)))
    ft = torch.from_numpy(np.moveaxis(f, -1, 1))  # NCHW
    flat = ft.flatten(2)  # (N, C, HW)
    want = (flat @ flat.transpose(1, 2) / (7 * 6 * 5)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_inpaint_loss_terms_match_torch_mirror(rng):
    n, s = 1, 32
    out = rng.random((n, s, s, 3)).astype(np.float32)
    gt = rng.random((n, s, s, 3)).astype(np.float32)
    mask = (rng.random((n, s, s, 1)) > 0.3).astype(np.float32)

    torch.manual_seed(3)
    tvgg = torch_ref.VGG16Features().eval()
    jvgg = VGG16Features(normalize=False)
    template = jax.jit(jvgg.init)(jax.random.key(0), jnp.asarray(out))
    from tests.test_models_parity import strict_merge

    vgg_vars = strict_merge(template, import_vgg16_features(tvgg.state_dict()))

    cfg = InpaintLossConfig(vgg_normalize=False)
    _, terms = jax.jit(
        lambda o, g, m: inpainting_loss(
            o, g, m, vgg_vars, config=cfg, vgg_model=jvgg
        )
    )(jnp.asarray(out), jnp.asarray(gt), jnp.asarray(mask))

    # --- independent torch mirror ---
    to = torch.from_numpy(np.moveaxis(out, -1, 1))
    tg = torch.from_numpy(np.moveaxis(gt, -1, 1))
    tm = torch.from_numpy(np.moveaxis(mask, -1, 1))
    comp = tm * tg + (1 - tm) * to
    hole = 1 - tm

    def masked_l1(a, b, m):
        return float((torch.abs(a - b) * m).sum() / (m.sum().clamp(min=1) * 3))

    assert abs(float(terms["valid"]) - masked_l1(to, tg, tm)) < 1e-5
    assert abs(float(terms["hole"]) - masked_l1(to, tg, hole)) < 1e-5

    with torch.no_grad():
        f_out, f_comp, f_gt = tvgg(to), tvgg(comp), tvgg(tg)
    perc = sum(
        float(torch.abs(a - g).sum() / g.numel() + torch.abs(c - g).sum() / g.numel())
        for a, c, g in zip(f_out, f_comp, f_gt)
    )
    assert abs(float(terms["perceptual"]) - perc) < 5e-4

    def gram_t(f):
        fl = f.flatten(2)
        return fl @ fl.transpose(1, 2) / (f.shape[1] * f.shape[2] * f.shape[3])

    style_out = sum(
        float(torch.abs(gram_t(a) - gram_t(g)).mean()) for a, g in zip(f_out, f_gt)
    )
    assert abs(float(terms["style_out"]) - style_out) < 1e-5

    region = F.max_pool2d(hole, 3, stride=1, padding=1)
    dy = (torch.abs(comp[:, :, 1:] - comp[:, :, :-1]) * region[:, :, 1:] * region[:, :, :-1]).sum()
    dx = (torch.abs(comp[..., 1:] - comp[..., :-1]) * region[..., 1:] * region[..., :-1]).sum()
    tv = float((dy + dx) / (region.sum().clamp(min=1) * 3))
    assert abs(float(terms["tv"]) - tv) < 1e-5

    want_total = (
        1.0 * float(terms["valid"]) + 6.0 * float(terms["hole"])
        + 0.05 * float(terms["perceptual"])
        + 120.0 * (float(terms["style_out"]) + float(terms["style_comp"]))
        + 0.1 * float(terms["tv"])
    )
    assert abs(float(terms["total"]) - want_total) < 1e-4


def test_tv_zero_when_no_hole(rng):
    comp = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    assert float(total_variation_loss(comp, jnp.zeros((1, 8, 8, 1)))) == 0.0


def test_vgg_maxpool_helper_matches_stock(rng):
    """models/vgg.py pools via the stock lowering (custom-VJP variant
    was tried and reverted — see the note in vgg.py)."""
    import flax.linen as fnn

    from text_segmentation_image_inpainting_tpu.models.vgg import _max_pool_2x2

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(_max_pool_2x2(x)), np.asarray(fnn.max_pool(x, (2, 2), strides=(2, 2)))
    )
    g_helper = jax.grad(lambda t: jnp.sum(jnp.sin(_max_pool_2x2(t))))(x)
    g_stock = jax.grad(
        lambda t: jnp.sum(jnp.sin(fnn.max_pool(t, (2, 2), strides=(2, 2))))
    )(x)
    np.testing.assert_allclose(np.asarray(g_helper), np.asarray(g_stock), rtol=1e-6)
