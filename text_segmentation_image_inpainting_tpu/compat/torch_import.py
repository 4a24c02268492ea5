"""torch ``state_dict`` -> flax variables importer.

Preserves the reference's checkpoint-compat promise (BASELINE.json:5
"checkpoint weights"; SURVEY.md section 5 "Checkpoint / resume"):
weights trained with the PyTorch reference (or torchvision pretrained
backbones) drop into the flax models. The tolerant-merge semantics of
the reference's ``BaseModule.load`` (shape-matched keys only, skip+warn)
are replicated via ``models.base.tolerant_merge``.

Works on plain ``{name: ndarray}`` dicts — torch is only needed to
``torch.load`` the file, so this module stays importable without torch.

Layout-provenance caveat: the *torchvision* importers
(:func:`import_torchvision_mobilenetv2`, :func:`import_vgg16_features`)
follow torchvision's published, externally-verifiable state_dict layout.
The *research-repo* importers (:func:`import_text_segmenter`,
:func:`import_inpaint_unet`, :func:`import_mobilenetv2_encoder`) are
round-trip-verified against this repo's torch oracle
(``tests/oracle/torch_ref.py``), a reconstruction — ``/root/reference``
was empty, so the actual upstream key names could not be checked.  If
the upstream's real checkpoints use different names, load them through
``tolerant_import`` (which now reports unmatched keys loudly) and remap.

Layout conversions:
  conv weight  OIHW -> HWIO   (transpose 2,3,1,0)
  depthwise conv (groups=C): torch (C,1,kh,kw) -> flax (kh,kw,1,C)
  batchnorm    weight->scale, bias->bias; running_{mean,var} -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from text_segmentation_image_inpainting_tpu.models.base import tolerant_merge
from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
    MOBILENETV2_CONFIG,
)

Arr = np.ndarray
StateDict = Mapping[str, Any]


def _np(t) -> Arr:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> Arr:
    """OIHW -> HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def depthwise_kernel(w) -> Arr:
    """torch depthwise (C,1,kh,kw) -> flax grouped (kh,kw,1,C)."""
    return _np(w).transpose(2, 3, 1, 0)


class _Vars:
    """Accumulates flax variables as nested dicts."""

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    @staticmethod
    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, path, sd, key, *, bias=True, depthwise=False):
        w = sd[key + ".weight"]
        kern = depthwise_kernel(w) if depthwise else conv_kernel(w)
        self._set(self.params, path + ("kernel",), kern)
        if bias and key + ".bias" in sd:
            self._set(self.params, path + ("bias",), _np(sd[key + ".bias"]))

    def bn(self, path, sd, key):
        self._set(self.params, path + ("scale",), _np(sd[key + ".weight"]))
        self._set(self.params, path + ("bias",), _np(sd[key + ".bias"]))
        self._set(self.batch_stats, path + ("mean",), _np(sd[key + ".running_mean"]))
        self._set(self.batch_stats, path + ("var",), _np(sd[key + ".running_var"]))

    def done(self):
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def _import_conv_bn_act(v: _Vars, flax_path, sd, torch_prefix):
    """oracle conv_bn_act Sequential: [0]=Conv2d(no bias), [1]=BN."""
    w = _np(sd[torch_prefix + ".0.weight"])
    depthwise = w.shape[1] == 1 and w.shape[0] > 1
    v.conv(flax_path + ("conv",), sd, torch_prefix + ".0", bias=False, depthwise=depthwise)
    v.bn(flax_path + ("bn",), sd, torch_prefix + ".1")


def import_mobilenetv2_encoder(sd: StateDict, *, prefix: str = "", path=()) -> dict:
    """Oracle/reference MobileNetV2Encoder state_dict -> flax variables.

    ``path`` prepends flax module nesting (e.g. ('encoder',) inside
    TextSegmenter).
    """
    v = _Vars()
    _import_conv_bn_act(v, path + ("stem",), sd, prefix + "stem")
    idx = 0
    for t, _, n, _ in MOBILENETV2_CONFIG:
        for _ in range(n):
            tp = f"{prefix}blocks.{idx}.block"
            fp = path + (f"block{idx}",)
            j = 0
            if t != 1:
                _import_conv_bn_act(v, fp + ("expand",), sd, f"{tp}.{j}")
                j += 1
            _import_conv_bn_act(v, fp + ("depthwise",), sd, f"{tp}.{j}")
            v.conv(fp + ("project_conv",), sd, f"{tp}.{j + 1}", bias=False)
            v.bn(fp + ("project_bn",), sd, f"{tp}.{j + 2}")
            idx += 1
    return v.done()


def _import_separable(v: _Vars, flax_path, sd, torch_prefix):
    """oracle XSeparableConv: .dw / .pw conv_bn_act pairs."""
    _import_conv_bn_act(v, flax_path + ("dw",), sd, torch_prefix + ".dw")
    _import_conv_bn_act(v, flax_path + ("pw",), sd, torch_prefix + ".pw")


def _import_xception_block(v: _Vars, flax_path, sd, torch_prefix, n_seps=3):
    for i in range(n_seps):
        _import_separable(v, flax_path + (f"sep{i}",), sd, f"{torch_prefix}.seps.{i}")
    if f"{torch_prefix}.skip.0.weight" in sd:  # middle blocks have no skip conv
        _import_conv_bn_act(v, flax_path + ("skip",), sd, f"{torch_prefix}.skip")


def import_xception_encoder(
    sd: StateDict, *, middle_repeats: int = 8, prefix: str = "", path=()
) -> dict:
    """Oracle/reference XceptionEncoder state_dict -> flax variables.

    Mirrors models/xception.py (SURVEY.md section 2.1 alternative-encoder
    extras [R-low]); round-trip-verified against tests/oracle/torch_ref.py.
    """
    v = _Vars()
    _import_conv_bn_act(v, path + ("stem1",), sd, prefix + "stem1")
    _import_conv_bn_act(v, path + ("stem2",), sd, prefix + "stem2")
    for bi in range(3):
        _import_xception_block(v, path + (f"entry{bi}",), sd, f"{prefix}entry.{bi}")
    for r in range(middle_repeats):
        _import_xception_block(v, path + (f"mid{r}",), sd, f"{prefix}mid.{r}")
    _import_xception_block(v, path + ("exit0",), sd, f"{prefix}exit0")
    _import_separable(v, path + ("exit1",), sd, f"{prefix}exit1")
    _import_separable(v, path + ("exit2",), sd, f"{prefix}exit2")
    return v.done()


def import_text_segmenter(
    sd: StateDict, *, backbone: str = "mobilenet_v2", head: str = "mini"
) -> dict:
    """Oracle/reference TextSegmenter (encoder+decoder) -> flax variables.

    Only the reference-era ``head='mini'`` decoder layout exists in
    torch form; the DeepLab-v3+ head is this framework's extension with
    no upstream state_dict to import — rejected cleanly here instead of
    failing with a raw KeyError mid-import."""
    if head != "mini":
        raise ValueError(
            f"import_text_segmenter: no torch-era layout exists for head={head!r}; "
            "only 'mini' checkpoints are importable (the DeepLab head is a "
            "framework extension — train it natively)"
        )
    if backbone == "xception":
        enc = import_xception_encoder(sd, prefix="encoder.", path=("encoder",))
    else:
        enc = import_mobilenetv2_encoder(sd, prefix="encoder.", path=("encoder",))
    v = _Vars()
    v.params = enc["params"]
    v.batch_stats = enc["batch_stats"]
    dp = ("decoder",)
    for i in range(3):
        _import_conv_bn_act(v, dp + (f"aspp{i}",), sd, f"decoder.aspp.{i}")
    for name in ("fuse", "skip4", "dec4", "skip2", "dec2"):
        _import_conv_bn_act(v, dp + (name,), sd, f"decoder.{name}")
    v.conv(dp + ("head",), sd, "decoder.head", bias=True)
    return v.done()


def import_inpaint_unet(sd: StateDict, *, depth: int = 8) -> dict:
    """Oracle/reference InpaintUNet state_dict -> flax variables."""
    v = _Vars()
    for i in range(depth):
        v.conv((f"enc{i}", ), sd, f"enc_convs.{i}.conv", bias=True)
        if f"enc_bns.{i}.weight" in sd:
            v.bn((f"enc{i}_bn",), sd, f"enc_bns.{i}")
    for j in range(depth - 1):
        lvl = depth - 1 - j
        v.conv((f"dec{lvl}",), sd, f"dec_convs.{j}.conv", bias=True)
        v.bn((f"dec{lvl}_bn",), sd, f"dec_bns.{j}")
    v.conv(("head",), sd, "head.conv", bias=True)
    return v.done()


def import_torchvision_mobilenetv2(sd: StateDict, *, path=()) -> dict:
    """torchvision ``mobilenet_v2().state_dict()`` -> flax encoder variables.

    The reference loads ImageNet-pretrained MobileNetV2 encoders
    (SURVEY.md C3); torchvision's layout differs from the research-repo
    layout handled by :func:`import_mobilenetv2_encoder`:

      features.0.{0,1}                 stem conv + bn
      features.i.conv.0.{0,1}          expand conv+bn  (dw conv+bn when t=1)
      features.i.conv.{1,2}[.{0,1}]    dw conv+bn / project conv+bn
      features.18.*, classifier.*      final 1x1 + head — not part of the
                                       encoder; drop via tolerant merge.
    """
    v = _Vars()

    def cba(flax_path, prefix):
        w = _np(sd[prefix + ".0.weight"])
        depthwise = w.shape[1] == 1 and w.shape[0] > 1
        v.conv(flax_path + ("conv",), sd, prefix + ".0", bias=False, depthwise=depthwise)
        v.bn(flax_path + ("bn",), sd, prefix + ".1")

    cba(path + ("stem",), "features.0")
    idx = 0
    feat = 1
    for t, _, n, _ in MOBILENETV2_CONFIG:
        for _ in range(n):
            fp = path + (f"block{idx}",)
            tp = f"features.{feat}.conv"
            if t == 1:
                cba(fp + ("depthwise",), f"{tp}.0")
                v.conv(fp + ("project_conv",), sd, f"{tp}.1", bias=False)
                v.bn(fp + ("project_bn",), sd, f"{tp}.2")
            else:
                cba(fp + ("expand",), f"{tp}.0")
                cba(fp + ("depthwise",), f"{tp}.1")
                v.conv(fp + ("project_conv",), sd, f"{tp}.2", bias=False)
                v.bn(fp + ("project_bn",), sd, f"{tp}.3")
            idx += 1
            feat += 1
    return v.done()


# torchvision vgg16.features conv indices for the first three pool stages
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14)


def import_vgg16_features(sd: StateDict, *, num_convs: int = 7, prefix: str = "features.") -> dict:
    """torchvision ``vgg16().state_dict()`` (or oracle VGG16Features with
    prefix='features.') -> flax VGG16Features variables."""
    v = _Vars()
    for n, idx in enumerate(_VGG16_CONV_IDX[:num_convs]):
        v.conv((f"conv{n}",), sd, f"{prefix}{idx}", bias=True)
    return v.done()


def tolerant_import(template: dict, imported: dict, *, return_report: bool = False):
    """Merge imported variables into a model's init template, keeping only
    shape-matched entries (reference BaseModule.load semantics).

    Logs a summary so a totally-mismatched layout (0 keys used -> random
    init) never passes silently; pass ``return_report=True`` to also get
    the tolerant_merge report dict.
    """
    import logging

    merged, report = tolerant_merge(template, imported)
    logging.getLogger(__name__).info(
        "tolerant_import: used %d, skipped %d (missing) / %d (shape), unfilled %d",
        len(report["used"]), len(report["skipped_missing"]),
        len(report["skipped_shape"]), len(report["unfilled"]),
    )
    return (merged, report) if return_report else merged


def load_torch_file(path: str) -> Dict[str, Arr]:
    """torch.load a checkpoint file into a plain {name: ndarray} dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _np(v) for k, v in sd.items()}
