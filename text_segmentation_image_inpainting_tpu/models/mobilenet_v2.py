"""MobileNetV2 encoder (Sandler et al. 2018), dilated for dense prediction.

TPU-first re-design of the reference's ``models/MobileNetV2.py``
(SURVEY.md C3): NHWC layout (native TPU conv layout), bf16 compute with
fp32 params/batch-stats, depthwise convs via ``feature_group_count``
(XLA lowers these to the VPU/MXU directly), stride swapped for dilation
past ``output_stride`` so the segmentation decoder sees stride-8
features. No data-dependent control flow — the whole stack traces to one
XLA computation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_segmentation_image_inpainting_tpu.ops import depthwise
from text_segmentation_image_inpainting_tpu.ops.conv import torch_same_padding

# (expansion t, out channels c, repeats n, first-block stride s)
MOBILENETV2_CONFIG: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def round_channels(c: float, width_mult: float, divisor: int = 8) -> int:
    """MobileNet channel rounding (multiple of 8; never below 90%)."""
    c = c * width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


_ACTS = {
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "relu": nn.relu,
    "leaky": lambda x: nn.leaky_relu(x, 0.2),
    "selu": nn.selu,
    "none": lambda x: x,
}


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation block (reference C2 building block).

    Activation selectable (ReLU6 / LeakyReLU / SELU — the reference's
    README experiments, SURVEY.md C2).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: str = "relu6"
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        p = torch_same_padding(self.kernel_size, self.dilation)
        if self.use_bn and depthwise.supports(
            self.features, self.groups, x.shape[-1], self.kernel_size, self.stride
        ):
            # depthwise: same forward conv, Pallas weight gradient
            # (ops/depthwise.py); param tree identical to the nn.Conv
            # branch, so checkpoints/importers see no difference
            x = depthwise.DepthwiseConv(
                self.features, self.kernel_size, dilation=self.dilation,
                dtype=self.dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((p[0], p[0]), (p[1], p[1])),
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum=0.1
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return _ACTS[self.act](x)


class InvertedResidual(nn.Module):
    """1x1 expand -> 3x3 depthwise (stride/dilation) -> 1x1 linear project,
    residual add when stride 1 and channels match (SURVEY.md C3)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cin = x.shape[-1]
        hidden = int(round(cin * self.expand_ratio))
        h = x
        if self.expand_ratio != 1:
            h = ConvBNAct(hidden, 1, dtype=self.dtype, name="expand")(h, train=train)
        h = ConvBNAct(
            hidden, 3, stride=self.stride, dilation=self.dilation, groups=hidden,
            dtype=self.dtype, name="depthwise",
        )(h, train=train)
        h = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="project_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="project_bn",
        )(h)
        if self.stride == 1 and cin == self.features:
            h = x + h
        return h


def _plan_blocks(width_mult: float, output_stride: int):
    """Static block plan: list of (features, stride, expand, dilation, tap)."""
    plan = []
    current_stride = 2  # after stem
    dilation = 1
    for t, c, n, s in MOBILENETV2_CONFIG:
        cout = round_channels(c, width_mult)
        for i in range(n):
            want = s if i == 0 else 1
            d, stride = dilation, want
            if want > 1:
                if current_stride >= output_stride:
                    # stride -> dilation swap: THIS block keeps the previous
                    # dilation; subsequent blocks dilate (DeepLab convention,
                    # mirrored in tests/oracle/torch_ref.py).
                    stride = 1
                    d = dilation
                    dilation *= want
                else:
                    current_stride *= want
            plan.append((cout, stride, t, d))
        if c == 24:
            plan[-1] = plan[-1] + ("s4",)
    return plan


class MobileNetV2Encoder(nn.Module):
    """Backbone returning multi-scale taps {'s2', 's4', 'out'}.

    ``output_stride`` in {8, 16, 32}: stages whose nominal stride would
    exceed it run at stride 1 with growing dilation instead, preserving
    spatial resolution for the dense decoder.
    """

    width_mult: float = 1.0
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        taps: Dict[str, jnp.ndarray] = {}
        x = ConvBNAct(
            round_channels(32, self.width_mult), 3, stride=2, dtype=self.dtype, name="stem"
        )(x, train=train)
        taps["s2"] = x
        for idx, entry in enumerate(_plan_blocks(self.width_mult, self.output_stride)):
            cout, stride, t, d = entry[:4]
            x = InvertedResidual(
                cout, stride=stride, expand_ratio=t, dilation=d,
                dtype=self.dtype, name=f"block{idx}",
            )(x, train=train)
            if len(entry) == 5:
                taps[entry[4]] = x
        taps["out"] = x
        return taps

    @property
    def out_channels(self) -> int:
        return round_channels(320, self.width_mult)
