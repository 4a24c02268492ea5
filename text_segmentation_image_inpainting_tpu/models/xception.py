"""Aligned-Xception-style encoder — the reference's alternative-backbone
experiment track (SURVEY.md section 2.1 "possible extras" [R-low]:
Xception / DeepLab-v3+-style encoder experiments), rebuilt TPU-native.

Same tap contract as ``MobileNetV2Encoder`` ({'s2', 's4', 'out'}), same
``output_stride`` stride->dilation swap (DeepLab convention), so
``TextSegmenter(backbone='xception')`` swaps it in with no decoder
changes. Structure follows DeepLab-v3+'s modified Xception: entry flow
(two conv stems + three strided separable blocks), ``middle_repeats``
residual middle blocks, exit flow (one strided block + two separable
convs to 2048 channels).

TPU notes: separable convs are depthwise (VPU) + pointwise (MXU) pairs;
channels stay multiples of 8 via ``round_channels`` so XLA tiles the
pointwise GEMMs cleanly; everything is shape-static under one jit.

Parity: mirrored operator-for-operator by
``tests/oracle/torch_ref.py::XceptionEncoder`` and importable from its
state_dict via ``compat/torch_import.py::import_xception_encoder``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
    ConvBNAct,
    round_channels,
)

# entry-flow blocks (each nominally stride 2)
XCEPTION_ENTRY: Tuple[Tuple[int, ...], ...] = (
    (128, 128, 128),
    (256, 256, 256),
    (728, 728, 728),
)
XCEPTION_EXIT: Tuple[int, ...] = (728, 1024, 1024)
XCEPTION_EXIT_SEPS: Tuple[int, ...] = (1536, 2048)


class SeparableConv(nn.Module):
    """Depthwise 3x3 (stride/dilation) + pointwise 1x1, each Conv-BN-ReLU."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cin = x.shape[-1]
        x = ConvBNAct(
            cin, 3, stride=self.stride, dilation=self.dilation, groups=cin,
            act="relu", dtype=self.dtype, name="dw",
        )(x, train=train)
        return ConvBNAct(
            self.features, 1, act="relu", dtype=self.dtype, name="pw"
        )(x, train=train)


class XceptionBlock(nn.Module):
    """N separable convs (stride on the last) + residual/projected skip.

    Identity skip when stride 1 and channels match (middle flow);
    1x1-conv-BN projection otherwise (entry/exit flow).
    """

    features: Sequence[int]
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cin = x.shape[-1]
        h = x
        for i, c in enumerate(self.features):
            s = self.stride if i == len(self.features) - 1 else 1
            h = SeparableConv(
                c, stride=s, dilation=self.dilation, dtype=self.dtype, name=f"sep{i}"
            )(h, train=train)
        cout = self.features[-1]
        if self.stride == 1 and cin == cout:
            return x + h
        skip = ConvBNAct(
            cout, 1, stride=self.stride, act="none", dtype=self.dtype, name="skip"
        )(x, train=train)
        return skip + h


def _stride_plan(output_stride: int, n_strided: int):
    """(stride, dilation) per nominally-strided stage under the DeepLab
    stride->dilation swap, starting after the stride-2 stem."""
    plan = []
    current, dilation = 2, 1
    for _ in range(n_strided):
        if current >= output_stride:
            plan.append((1, dilation))
            dilation *= 2
        else:
            plan.append((2, dilation))
            current *= 2
    return plan


class XceptionEncoder(nn.Module):
    """Backbone returning multi-scale taps {'s2', 's4', 'out'}."""

    width_mult: float = 1.0
    output_stride: int = 8
    middle_repeats: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        wm = self.width_mult
        taps: Dict[str, jnp.ndarray] = {}
        x = ConvBNAct(
            round_channels(32, wm), 3, stride=2, act="relu", dtype=self.dtype,
            name="stem1",
        )(x, train=train)
        x = ConvBNAct(
            round_channels(64, wm), 3, act="relu", dtype=self.dtype, name="stem2"
        )(x, train=train)
        taps["s2"] = x

        plan = _stride_plan(self.output_stride, len(XCEPTION_ENTRY) + 1)
        for bi, chans in enumerate(XCEPTION_ENTRY):
            stride, d = plan[bi]
            x = XceptionBlock(
                tuple(round_channels(c, wm) for c in chans), stride=stride, dilation=d,
                dtype=self.dtype, name=f"entry{bi}",
            )(x, train=train)
            if bi == 0:
                taps["s4"] = x

        # middle flow runs at the final dilation of the entry flow
        mid_d = plan[len(XCEPTION_ENTRY) - 1][1] * (
            2 if plan[len(XCEPTION_ENTRY) - 1][0] == 1 else 1
        )
        mid_c = round_channels(XCEPTION_ENTRY[-1][-1], wm)
        for r in range(self.middle_repeats):
            x = XceptionBlock(
                (mid_c, mid_c, mid_c), dilation=mid_d, dtype=self.dtype,
                name=f"mid{r}",
            )(x, train=train)

        stride, d = plan[len(XCEPTION_ENTRY)]
        x = XceptionBlock(
            tuple(round_channels(c, wm) for c in XCEPTION_EXIT), stride=stride,
            dilation=d, dtype=self.dtype, name="exit0",
        )(x, train=train)
        exit_d = d * (2 if stride == 1 else 1)
        for i, c in enumerate(XCEPTION_EXIT_SEPS):
            x = SeparableConv(
                round_channels(c, wm), dilation=exit_d, dtype=self.dtype,
                name=f"exit{i + 1}",
            )(x, train=train)
        taps["out"] = x
        return taps

    @property
    def out_channels(self) -> int:
        return round_channels(XCEPTION_EXIT_SEPS[-1], self.width_mult)
