"""Model-level output fidelity vs the torch-CPU oracle with identical
weights (BASELINE.json:5 explicit requirement; SURVEY.md section 4)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import traverse_util

from text_segmentation_image_inpainting_tpu.compat.torch_import import (
    import_inpaint_unet,
    import_mobilenetv2_encoder,
    import_text_segmenter,
    import_vgg16_features,
)
from text_segmentation_image_inpainting_tpu.models import (
    InpaintUNet,
    MobileNetV2Encoder,
    TextSegmenter,
    VGG16Features,
)
from text_segmentation_image_inpainting_tpu.models.base import tolerant_merge, total_parameters
from tests.oracle import torch_ref


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def strict_merge(template, imported):
    """tolerant_merge + assert the importer covered the model exactly."""
    merged, report = tolerant_merge(template, imported)
    assert not report["skipped_shape"], report["skipped_shape"][:5]
    assert not report["skipped_missing"], report["skipped_missing"][:5]
    assert not report["unfilled"], report["unfilled"][:5]
    return merged


@pytest.fixture(scope="module")
def seg_pair():
    torch.manual_seed(0)
    ref = torch_ref.TextSegmenter(width_mult=1.0, output_stride=8).eval()
    model = TextSegmenter(width_mult=1.0, output_stride=8)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    template = jax.jit(model.init)(jax.random.key(0), jnp.asarray(x))
    sd = {k: v for k, v in ref.state_dict().items()}
    variables = strict_merge(template, import_text_segmenter(sd))
    return ref, model, variables, x


def test_text_segmenter_matches_oracle(seg_pair):
    ref, model, variables, x = seg_pair
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x, -1, 1))))
    assert got.shape == want.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_mobilenet_encoder_taps_match_oracle(seg_pair):
    ref, _, _, x = seg_pair
    enc = MobileNetV2Encoder(width_mult=1.0, output_stride=8)
    sd = {k[len("encoder.") :]: v for k, v in ref.state_dict().items() if k.startswith("encoder.")}
    template = jax.jit(enc.init)(jax.random.key(0), jnp.asarray(x))
    variables = strict_merge(template, import_mobilenetv2_encoder(sd))
    got = jax.jit(enc.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        want = ref.encoder(torch.from_numpy(np.moveaxis(x, -1, 1)))
    for k in ("s2", "s4", "out"):
        np.testing.assert_allclose(
            np.asarray(got[k]), to_nhwc(want[k]), rtol=1e-3, atol=1e-4, err_msg=k
        )
    # stride geometry: s2 is half res, s4 quarter, out = output_stride 8
    assert got["s2"].shape[1] == 32 and got["s4"].shape[1] == 16 and got["out"].shape[1] == 8


@pytest.mark.parametrize("depth", [4, 5])
def test_inpaint_unet_matches_oracle(depth):
    torch.manual_seed(1)
    ref = torch_ref.InpaintUNet(depth=depth).eval()
    model = InpaintUNet(depth=depth)
    rng = np.random.default_rng(1)
    size = 1 << depth  # minimal: bottleneck 1x1... use 2x
    size *= 2
    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    mask = (rng.random((2, size, size, 1)) > 0.3).astype(np.float32)
    x_holes = x * mask
    template = jax.jit(model.init)(jax.random.key(0), jnp.asarray(x_holes), jnp.asarray(mask))
    variables = strict_merge(template, import_inpaint_unet(ref.state_dict(), depth=depth))
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x_holes), jnp.asarray(mask)))
    with torch.no_grad():
        want = to_nhwc(
            ref(
                torch.from_numpy(np.moveaxis(x_holes, -1, 1)),
                torch.from_numpy(np.moveaxis(mask, -1, 1)),
            )
        )
    assert got.shape == want.shape == (2, size, size, 3)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_vgg16_features_match_oracle():
    torch.manual_seed(2)
    ref = torch_ref.VGG16Features().eval()
    model = VGG16Features(normalize=False)
    rng = np.random.default_rng(2)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    template = jax.jit(model.init)(jax.random.key(0), jnp.asarray(x))
    variables = strict_merge(template, import_vgg16_features(ref.state_dict()))
    got = jax.jit(model.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        want = ref(torch.from_numpy(np.moveaxis(x, -1, 1)))
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), to_nhwc(w), rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_tolerant_partial_load_encoder_only(seg_pair):
    """Reference behavior: encoder-only checkpoint loads into the full
    model, decoder keeps its fresh init (SURVEY.md section 3.4)."""
    ref, model, _, x = seg_pair
    template = jax.jit(model.init)(jax.random.key(7), jnp.asarray(x))
    enc_only = import_mobilenetv2_encoder(
        {k[len("encoder.") :]: v for k, v in ref.state_dict().items() if k.startswith("encoder.")},
        path=("encoder",),
    )
    merged, report = tolerant_merge(template, enc_only)
    assert len(report["used"]) > 100 and not report["skipped_shape"]
    flat_t = traverse_util.flatten_dict(template, sep="/")
    flat_m = traverse_util.flatten_dict(merged, sep="/")
    # decoder untouched
    dec_keys = [k for k in flat_t if "/decoder/" in k]
    assert dec_keys
    for k in dec_keys:
        np.testing.assert_array_equal(np.asarray(flat_m[k]), np.asarray(flat_t[k]))
    # encoder changed
    enc_key = next(k for k in flat_t if "/encoder/stem/conv/" in k)
    assert not np.array_equal(np.asarray(flat_m[enc_key]), np.asarray(flat_t[enc_key]))


def test_total_parameters_matches_torch(seg_pair):
    ref, _, variables, _ = seg_pair
    n_torch = sum(p.numel() for p in ref.parameters())
    assert total_parameters(variables["params"]) == n_torch


def test_torchvision_mobilenetv2_import(seg_pair):
    """torchvision-layout state_dicts load into the encoder: rebuild the
    oracle encoder weights under torchvision naming and check the import
    matches the research-layout import exactly."""
    from text_segmentation_image_inpainting_tpu.compat.torch_import import (
        import_torchvision_mobilenetv2,
    )
    from tests.oracle.torch_ref import MOBILENETV2_CONFIG

    ref, _, _, _ = seg_pair
    sd = {k[len("encoder.") :]: v for k, v in ref.state_dict().items()
          if k.startswith("encoder.")}

    # research layout -> torchvision naming
    tv = {}
    for suff in ("weight", "bias", "running_mean", "running_var"):
        for j in (0, 1):
            k = f"stem.{j}.{suff}"
            if k in sd:
                tv[f"features.0.{j}.{suff}"] = sd[k]
    idx, feat = 0, 1
    for t, _, n, _ in MOBILENETV2_CONFIG:
        for _ in range(n):
            bp = f"blocks.{idx}.block"
            cp = f"features.{feat}.conv"
            if t == 1:
                pairs = [(f"{bp}.0.0", f"{cp}.0.0"), (f"{bp}.0.1", f"{cp}.0.1"),
                         (f"{bp}.1", f"{cp}.1"), (f"{bp}.2", f"{cp}.2")]
            else:
                pairs = [(f"{bp}.0.0", f"{cp}.0.0"), (f"{bp}.0.1", f"{cp}.0.1"),
                         (f"{bp}.1.0", f"{cp}.1.0"), (f"{bp}.1.1", f"{cp}.1.1"),
                         (f"{bp}.2", f"{cp}.2"), (f"{bp}.3", f"{cp}.3")]
            for src, dst in pairs:
                for suff in ("weight", "bias", "running_mean", "running_var"):
                    k = f"{src}.{suff}"
                    if k in sd:
                        tv[f"{dst}.{suff}"] = sd[k]
            idx += 1
            feat += 1

    got = import_torchvision_mobilenetv2(tv)
    want = import_mobilenetv2_encoder(sd)
    flat_g = traverse_util.flatten_dict(got, sep="/")
    flat_w = traverse_util.flatten_dict(want, sep="/")
    assert set(flat_g) == set(flat_w)
    for k in flat_w:
        np.testing.assert_array_equal(np.asarray(flat_g[k]), np.asarray(flat_w[k]), err_msg=k)


def test_torch_export_roundtrip(seg_pair):
    """flax -> torch export: exported weights load back into the oracle
    and reproduce the flax model's output (full reverse-compat loop)."""
    from text_segmentation_image_inpainting_tpu.compat.torch_export import (
        export_text_segmenter,
    )

    ref, model, variables, x = seg_pair
    sd = export_text_segmenter(variables)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected[:5]
    assert all("num_batches_tracked" in m for m in missing), missing[:5]
    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x, -1, 1))))
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_torch_export_inpaint_roundtrip(rng):
    from text_segmentation_image_inpainting_tpu.compat.torch_export import (
        export_inpaint_unet,
    )

    torch.manual_seed(4)
    depth = 4
    ref = torch_ref.InpaintUNet(depth=depth).eval()
    model = InpaintUNet(depth=depth)
    size = 32
    x = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    mask = (rng.random((1, size, size, 1)) > 0.3).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.key(3), jnp.asarray(x * mask), jnp.asarray(mask))
    sd = export_inpaint_unet(variables, depth=depth)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected
    with torch.no_grad():
        want = to_nhwc(ref(torch.from_numpy(np.moveaxis(x * mask, -1, 1)),
                           torch.from_numpy(np.moveaxis(mask, -1, 1))))
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x * mask), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
