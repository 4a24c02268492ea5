"""2-D convolution with PyTorch-compatible padding semantics, NHWC layout.

The reference framework builds everything from ``torch.nn.Conv2d`` with
integer ``padding=k//2`` (symmetric zero pad). XLA's ``'SAME'`` padding
differs from torch for even kernels / stride>1, so we always lower to
explicit per-edge padding pairs to guarantee bit-compatible output
geometry with the torch-CPU parity oracle (SURVEY.md section 4).

TPU notes: NHWC is the native TPU conv layout ("HWIO" kernels); XLA maps
these convs onto the MXU directly. Keep channel counts multiples of 128
where possible for best tiling (models round up internally where free).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOrPair = Union[int, Tuple[int, int], Sequence[int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def torch_same_padding(kernel_size: IntOrPair, dilation: IntOrPair = 1) -> Tuple[int, int]:
    """Padding a torch user would pass as ``padding=k//2`` (per dim, dilated)."""
    kh, kw = _pair(kernel_size)
    dh, dw = _pair(dilation)
    return (dh * (kh - 1) // 2, dw * (kw - 1) // 2)


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    bias: jax.Array | None = None,
    preferred_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """``torch.nn.functional.conv2d`` semantics on NHWC / HWIO.

    Args:
      x: (N, H, W, Cin).
      kernel: (kh, kw, Cin // groups, Cout)  (HWIO).
      stride/padding/dilation: ints or (h, w) pairs; padding is symmetric
        zero padding exactly like torch's integer ``padding=`` argument.
      groups: feature group count (``groups == Cin`` -> depthwise).
      bias: optional (Cout,).
      preferred_dtype: accumulation dtype (fp32 for bf16 inputs by default).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    # preferred_element_type widening breaks conv transposition under
    # autodiff (jax 0.9); TPU accumulates bf16 convs in f32 natively, so
    # only pass it when explicitly requested for a non-diff path.
    kwargs = {} if preferred_dtype is None else {"preferred_element_type": preferred_dtype}
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        **kwargs,
    )
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_output_size(size: int, kernel: int, stride: int, padding: int, dilation: int = 1) -> int:
    """Torch Conv2d output-size formula (floor)."""
    eff = dilation * (kernel - 1) + 1
    return (size + 2 * padding - eff) // stride + 1
