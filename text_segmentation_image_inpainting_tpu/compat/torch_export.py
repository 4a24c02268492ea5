"""flax variables -> torch ``state_dict`` exporter (reverse of
torch_import). Lets weights trained in this framework flow back to
reference-layout PyTorch models for side-by-side comparison or
deployment in torch serving stacks. Pure numpy — torch only needed to
``torch.save`` the result.

Layout conversions (inverse of torch_import):
  conv kernel  HWIO -> OIHW; depthwise (kh,kw,1,C) -> (C,1,kh,kw)
  batchnorm    scale->weight, bias->bias, batch_stats -> running_{mean,var}
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
    MOBILENETV2_CONFIG,
)


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


class _SD:
    def __init__(self, variables):
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.out: Dict[str, np.ndarray] = {}

    def conv(self, flax_path, key, *, depthwise=False):
        node = _get(self.params, flax_path)
        k = _np(node["kernel"])
        # HWIO -> OIHW (the same permutation maps depthwise (kh,kw,1,C)
        # to torch's (C,1,kh,kw))
        self.out[key + ".weight"] = k.transpose(3, 2, 0, 1)
        if "bias" in node:
            self.out[key + ".bias"] = _np(node["bias"])

    def bn(self, flax_path, key):
        p = _get(self.params, flax_path)
        s = _get(self.batch_stats, flax_path)
        self.out[key + ".weight"] = _np(p["scale"])
        self.out[key + ".bias"] = _np(p["bias"])
        self.out[key + ".running_mean"] = _np(s["mean"])
        self.out[key + ".running_var"] = _np(s["var"])
        self.out[key + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def cba(self, flax_path, prefix, *, depthwise=False):
        self.conv(flax_path + ("conv",), prefix + ".0", depthwise=depthwise)
        self.bn(flax_path + ("bn",), prefix + ".1")


def export_mobilenetv2_encoder(variables: dict, *, prefix: str = "", path=()) -> Dict[str, Any]:
    """flax encoder variables -> research-layout torch state_dict."""
    sd = _SD(variables)
    sd.cba(path + ("stem",), prefix + "stem")
    idx = 0
    for t, _, n, _ in MOBILENETV2_CONFIG:
        for _ in range(n):
            tp = f"{prefix}blocks.{idx}.block"
            fp = path + (f"block{idx}",)
            j = 0
            if t != 1:
                sd.cba(fp + ("expand",), f"{tp}.{j}")
                j += 1
            sd.cba(fp + ("depthwise",), f"{tp}.{j}", depthwise=True)
            sd.conv(fp + ("project_conv",), f"{tp}.{j + 1}")
            sd.bn(fp + ("project_bn",), f"{tp}.{j + 2}")
            idx += 1
    return sd.out


def export_text_segmenter(variables: dict) -> Dict[str, Any]:
    out = export_mobilenetv2_encoder(variables, prefix="encoder.", path=("encoder",))
    sd = _SD(variables)
    dp = ("decoder",)
    for i in range(3):
        sd.cba(dp + (f"aspp{i}",), f"decoder.aspp.{i}")
    for name in ("fuse", "skip4", "dec4", "skip2", "dec2"):
        sd.cba(dp + (name,), f"decoder.{name}")
    sd.conv(dp + ("head",), "decoder.head")
    out.update(sd.out)
    return out


def export_inpaint_unet(variables: dict, *, depth: int = 8) -> Dict[str, Any]:
    sd = _SD(variables)
    for i in range(depth):
        sd.conv((f"enc{i}",), f"enc_convs.{i}.conv")
        if f"enc{i}_bn" in variables["params"]:
            sd.bn((f"enc{i}_bn",), f"enc_bns.{i}")
    for j in range(depth - 1):
        lvl = depth - 1 - j
        sd.conv((f"dec{lvl}",), f"dec_convs.{j}.conv")
        sd.bn((f"dec{lvl}_bn",), f"dec_bns.{j}")
    sd.conv(("head",), "head.conv")
    return sd.out


def save_torch_file(path: str, state_dict: Dict[str, Any]) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()}, path)
