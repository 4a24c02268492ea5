"""Spectral-norm conv + SAGAN self-attention parity vs the torch oracle
(SURVEY.md section 2.1 extras [R-low]: the reference's README-era
spectral-norm / self-attention experiment track)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.oracle import torch_ref
from text_segmentation_image_inpainting_tpu.models.experiments import (
    SelfAttention2d,
    SpectralNormConv2d,
)


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def oihw_to_hwio(w):
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _sn_state(prefix, sd):
    """(kernel_hwio, u, v) from a torch spectral_norm'd conv's state_dict."""
    return (
        oihw_to_hwio(sd[f"{prefix}.weight_orig"]),
        sd[f"{prefix}.weight_u"].numpy(),
        sd[f"{prefix}.weight_v"].numpy(),
    )


def test_spectral_norm_conv_eval_matches_torch():
    torch.manual_seed(0)
    ref = torch_ref.SNConv2d(8, 16, 3, stride=2).eval()
    sd = ref.state_dict()
    kernel, u, v = _sn_state("conv", sd)
    variables = {
        "params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(sd["conv.bias"].numpy())},
        "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
    }
    model = SpectralNormConv2d(16, 3, stride=2)
    x = np.random.default_rng(0).standard_normal((2, 16, 16, 8)).astype(np.float32)
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x, -1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spectral_norm_conv_train_step_matches_torch():
    """One training forward: the power iteration must update u/v exactly
    like torch's (n_power_iterations=1) and produce the same output."""
    torch.manual_seed(1)
    ref = torch_ref.SNConv2d(4, 8, 3)
    sd = ref.state_dict()
    kernel, u, v = _sn_state("conv", sd)
    variables = {
        "params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(sd["conv.bias"].numpy())},
        "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
    }
    model = SpectralNormConv2d(8, 3)
    x = np.random.default_rng(1).standard_normal((1, 8, 8, 4)).astype(np.float32)
    got, mut = model.apply(
        variables, jnp.asarray(x), update_stats=True, mutable=["spectral"]
    )
    ref.train()
    with torch.no_grad():
        want = ref(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-4, atol=1e-5)
    sd2 = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(mut["spectral"]["u"]), sd2["conv.weight_u"].numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mut["spectral"]["v"]), sd2["conv.weight_v"].numpy(), rtol=1e-5, atol=1e-6
    )


def test_spectral_norm_bounds_sigma():
    """After a few update steps the effective kernel's top singular value
    must sit at ~1 (the whole point of the experiment track)."""
    model = SpectralNormConv2d(12, 3, use_bias=False)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 8, 8, 6)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    # scale the raw kernel so sigma is far from 1 pre-normalization
    variables = {
        **variables,
        "params": {"kernel": variables["params"]["kernel"] * 7.3},
    }
    for _ in range(8):
        _, mut = model.apply(variables, x, update_stats=True, mutable=["spectral"])
        variables = {**variables, "spectral": mut["spectral"]}
    k = variables["params"]["kernel"]
    wmat = jnp.transpose(k, (3, 2, 0, 1)).reshape(k.shape[-1], -1)
    sigma_true = float(jnp.linalg.svd(wmat, compute_uv=False)[0])
    u = variables["spectral"]["u"]
    v = variables["spectral"]["v"]
    sigma_est = float(u @ (wmat @ v))
    # power iteration converged: estimate within 1% of the true sigma,
    # so the normalized kernel has spectral norm ~1
    assert abs(sigma_est - sigma_true) / sigma_true < 0.01


def _fill_attention_variables(template, ref, spectral_norm):
    sd = ref.state_dict()
    params = dict(template["params"])
    out = {"params": params}
    if spectral_norm:
        spectral = {}
        for name in ("query", "key", "value", "out"):
            kernel, u, v = _sn_state(name, sd)
            params[name] = {"kernel": jnp.asarray(kernel)}
            spectral[name] = {"u": jnp.asarray(u), "v": jnp.asarray(v)}
        out["spectral"] = spectral
    else:
        for name in ("query", "key", "value", "out"):
            params[name] = {"kernel": jnp.asarray(oihw_to_hwio(sd[f"{name}.weight"]))}
    params["gamma"] = jnp.asarray(sd["gamma"].numpy())
    return out


def test_self_attention_matches_torch():
    torch.manual_seed(3)
    ref = torch_ref.SelfAttention2d(32).eval()
    with torch.no_grad():
        ref.gamma.fill_(0.7)  # nonzero so the attention path is exercised
    model = SelfAttention2d()
    x = np.random.default_rng(3).standard_normal((2, 12, 12, 32)).astype(np.float32)
    template = model.init(jax.random.key(1), jnp.asarray(x))
    variables = _fill_attention_variables(template, ref, spectral_norm=False)
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x, -1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_self_attention_spectral_norm_matches_torch():
    torch.manual_seed(4)
    ref = torch_ref.SelfAttention2d(16, spectral_norm=True).eval()
    with torch.no_grad():
        ref.gamma.fill_(-0.4)
    model = SelfAttention2d(spectral_norm=True)
    x = np.random.default_rng(4).standard_normal((1, 8, 8, 16)).astype(np.float32)
    template = model.init(jax.random.key(2), jnp.asarray(x))
    variables = _fill_attention_variables(template, ref, spectral_norm=True)
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x, -1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_self_attention_starts_as_identity_and_grads_flow():
    """gamma inits to 0 (block == identity) but gradient still reaches the
    projections through the gamma cotangent."""
    model = SelfAttention2d()
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 8, 8, 16)).astype(np.float32)
    )
    variables = model.init(jax.random.key(3), x)
    y = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-6)

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(g["gamma"])) > 0


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_inpaint_unet_attention_bottleneck():
    """InpaintUNet(attention=True): SAGAN block at the bottleneck — output
    geometry unchanged, attention params exist and receive gradient."""
    from text_segmentation_image_inpainting_tpu.models import InpaintUNet

    model = InpaintUNet(depth=4, attention=True)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    m = jnp.asarray((rng.random((1, 32, 32, 1)) > 0.3).astype(np.float32))
    variables = model.init(jax.random.key(4), x, m)
    assert "attn" in variables["params"]
    out = jax.jit(model.apply)(variables, x, m)
    assert out.shape == (1, 32, 32, 3)

    def loss(p):
        return jnp.mean(model.apply({**variables, "params": p}, x, m) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g["attn"])
    assert leaves and all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_spectral_norm_conv_grad_matches_torch():
    """Training-mode gradient parity: torch detaches u/v, so
    d sigma / dW == u v^T exactly — the jax implementation must not
    differentiate through the power-iteration chain."""
    torch.manual_seed(7)
    ref = torch_ref.SNConv2d(4, 6, 3)
    sd = ref.state_dict()
    kernel, u, v = _sn_state("conv", sd)
    # state_dict tensors SHARE storage with the module, and .numpy()
    # shares with the tensor — torch's in-place power iteration below
    # would silently mutate these views, so snapshot them now
    kernel, u, v = kernel.copy(), u.copy(), v.copy()
    bias = sd["conv.bias"].numpy().copy()
    x = np.random.default_rng(7).standard_normal((2, 8, 8, 4)).astype(np.float32)

    ref.train()
    xt = torch.from_numpy(np.moveaxis(x, -1, 1)).requires_grad_(False)
    ref.zero_grad()
    ref(xt).sum().backward()
    want = oihw_to_hwio(ref.conv.weight_orig.grad)
    want_bias = ref.conv.bias.grad.numpy()

    model = SpectralNormConv2d(6, 3)
    variables = {
        "params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)},
        "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
    }

    def loss(params):
        out, _ = model.apply(
            {**variables, "params": params}, jnp.asarray(x),
            update_stats=True, mutable=["spectral"],
        )
        return jnp.sum(out)

    g = jax.grad(loss)(variables["params"])
    np.testing.assert_allclose(np.asarray(g["kernel"]), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g["bias"]), want_bias, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_inpaint_train_step_attention_sn_driver_path():
    """The driver stack trains InpaintUNet(attention_sn=True): the
    'spectral' collection rides the TrainState, power-iterates each
    step, and the loss stays finite / decreases on a repeated batch."""
    from text_segmentation_image_inpainting_tpu.models import InpaintUNet, VGG16Features
    from text_segmentation_image_inpainting_tpu.train import (
        InpaintTrainConfig,
        create_train_state,
        make_inpaint_train_step,
    )
    from text_segmentation_image_inpainting_tpu.train.config import OptimizerConfig
    from text_segmentation_image_inpainting_tpu.train.inpaint import make_inpaint_eval_step

    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.25).astype(np.float32))
    batch = {"image": img, "mask": mask}

    cfg = InpaintTrainConfig(
        image_size=(32, 32), batch_size=2, depth=3, attention=True,
        attention_sn=True, bf16_compute=False,
        optimizer=OptimizerConfig(learning_rate=1e-3),
    )
    model = InpaintUNet(depth=cfg.depth, attention=True, attention_sn=True)
    variables = jax.jit(model.init)(jax.random.key(0), img, mask)
    assert "spectral" in variables
    vgg = VGG16Features()
    vgg_vars = jax.jit(vgg.init)(jax.random.key(1), img)

    state = create_train_state(variables, model.apply, cfg.optimizer)
    assert state.spectral is not None
    u0 = state.spectral["attn"]["query"]["u"]
    step = jax.jit(make_inpaint_train_step(model, cfg, vgg_vars))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # power iteration actually ran: u moved from its initial value
    assert float(jnp.abs(state.spectral["attn"]["query"]["u"] - u0).max()) > 0

    # eval path reads (doesn't mutate) the spectral collection
    ev = jax.jit(make_inpaint_eval_step(model))(state, batch)
    assert np.isfinite(float(ev["psnr"]))


def test_spectral_norm_zero_power_iterations():
    """torch's n_power_iterations=0 is valid ('use stored u/v, never
    iterate') — training forwards must not crash and must not move u/v."""
    model = SpectralNormConv2d(8, 3, n_power_iterations=0)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 8, 8, 4)).astype(np.float32)
    )
    variables = model.init(jax.random.key(5), x)
    y, mut = model.apply(variables, x, update_stats=True, mutable=["spectral"])
    assert bool(jnp.isfinite(y).all())
    np.testing.assert_array_equal(
        np.asarray(mut["spectral"]["u"]), np.asarray(variables["spectral"]["u"])
    )
