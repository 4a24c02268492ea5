"""Depthwise convolution with a TPU-optimized weight-gradient path.

Forward is the plain XLA depthwise conv (identical math and lowering to
``nn.Conv(feature_group_count=C)`` — XLA maps it straight onto the
VPU). The backward swaps XLA's batch-group-conv weight gradient (the
profiled 2.9x fwd:bwd blowup of the MobileNetV2 encoder train step,
docs/KERNEL_NOTES.md round 3) for the single-pass Pallas
multiply-reduce kernel in ``ops/pallas/depthwise_wgrad.py``; the input
gradient stays an XLA conv (a stride-1 'same'-pad depthwise conv's
input gradient is the same conv with a spatially flipped kernel — XLA
lowers that well already).

Scope matches the kernel: stride 1, odd square kernel, torch-'same'
symmetric padding, C >= 128. ``DepthwiseConv`` (the flax wrapper)
falls back to ``nn.Conv`` outside that scope and is parameter-tree
compatible with it (same ``conv/kernel`` path, same shape, same
default init), so checkpoints and the torch importer are unaffected.

Reference: the reference's MobileNetV2 depthwise layers
(``models/MobileNetV2.py`` [R], SURVEY.md C2/C3) train under cuDNN,
which has native depthwise wgrad kernels; this module is the TPU
equivalent of that fast path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from text_segmentation_image_inpainting_tpu.ops.conv import conv2d, torch_same_padding

# Trace-time switch (tests flip it to compare paths). Default OFF: the
# measured A/B/C ablation on the v5e chip (docs/KERNEL_NOTES.md round 3)
# found XLA's own depthwise wgrad is NOT the encoder-backward bottleneck
# it profiled as — full encoder grad is 21.7 ms pure-XLA, 21.6 ms with
# this module's custom vjp + XLA wgrad, and 35.4 ms with the Pallas
# wgrad kernel (~1 ms/layer slower). The kernel and its parity tests
# stay as recorded infrastructure; flip this only with fresh numbers.
USE_CUSTOM_WGRAD: bool = False


def _default_interpret() -> bool:
    # compiled Mosaic only exists on TPU; interpret elsewhere (tests pin
    # the default device to CPU while the TPU plugin stays registered)
    default_dev = jax.config.jax_default_device
    return jax.default_backend() != "tpu" or (
        default_dev is not None and getattr(default_dev, "platform", None) == "cpu"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv2d(x, kernel, dilation: int = 1, interpret: bool | None = None):
    """Stride-1 torch-'same' depthwise conv, custom wgrad on TPU.

    Args:
      x: (N, H, W, C).
      kernel: (k, k, 1, C) HWIO, k odd.
    """
    k = kernel.shape[0]
    p = torch_same_padding(k, dilation)[0]
    return conv2d(x, kernel, stride=1, padding=p, dilation=dilation, groups=x.shape[-1])


def _fwd(x, kernel, dilation, interpret):
    return depthwise_conv2d(x, kernel, dilation, interpret), (x, kernel)


def _bwd(dilation, interpret, res, dy):
    x, kernel = res
    k = kernel.shape[0]
    c = x.shape[-1]
    p = torch_same_padding(k, dilation)[0]
    # input grad: same-pad stride-1 depthwise is self-adjoint up to a
    # spatial kernel flip
    dx = conv2d(
        dy,
        kernel[::-1, ::-1].astype(dy.dtype),
        stride=1,
        padding=p,
        dilation=dilation,
        groups=c,
    )
    from text_segmentation_image_inpainting_tpu.ops.pallas.depthwise_wgrad import (
        depthwise_wgrad,
    )

    itp = _default_interpret() if interpret is None else interpret
    dw = depthwise_wgrad(x, dy, k, dilation, itp).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


depthwise_conv2d.defvjp(_fwd, _bwd)


class DepthwiseConv(nn.Module):
    """Param-compatible replacement for the depthwise ``nn.Conv``.

    Produces the identical parameter (``kernel`` of shape (k, k, 1, C)
    under the same module name, same lecun-normal init) and identical
    forward values; only the weight-gradient lowering differs.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        return depthwise_conv2d(
            x.astype(self.dtype), kernel.astype(self.dtype), self.dilation
        )


def supports(features: int, groups: int, cin: int, kernel_size: int, stride: int) -> bool:
    """True when the custom wgrad path covers this conv configuration.

    Checks ``USE_CUSTOM_WGRAD`` (default False) BEFORE importing the
    Pallas kernel module: ``supports`` runs on every ``ConvBNAct`` trace,
    and a pallas import must never be a precondition for the plain XLA
    path (the round-3 hermetic regression, VERDICT.md Weak #1).
    """
    if not USE_CUSTOM_WGRAD:
        return False
    from text_segmentation_image_inpainting_tpu.ops.pallas import depthwise_wgrad as dw

    return (
        groups == features == cin
        and stride == 1
        and kernel_size % 2 == 1
        and features >= dw._TC
    )
