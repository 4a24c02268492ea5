"""Spatial (H-axis) sharding with conv halo exchange — the framework's
sequence/context-parallel analogue (SURVEY.md section 2.2).

The reference has no attention and no sequence dim; its scale axis is
image resolution. For pages too large for one chip, the TPU-native
answer is to shard H over the mesh and exchange k//2-row halos between
neighbors with ``lax.ppermute`` (ICI neighbor traffic, no all-gather).
``ppermute`` leaves non-received buffers zero, which at the outer
devices reproduces the global zero padding exactly — so sharded output
is bit-comparable to the single-device op.

This is a working prototype wired for stride-1 convs / partial convs
(the inpainting decoder's shape); full-model spatial sharding (strides,
bilinear resizes) is a documented follow-on, not v1
(BASELINE.json parity needs only DP over pages).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from text_segmentation_image_inpainting_tpu.parallel.mesh import DATA_AXIS


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate ``halo`` rows from each H-neighbor: (N,Hl,W,C) ->
    (N, Hl+2*halo, W, C). Ring ends receive zeros (= global zero pad)."""
    if halo <= 0:
        return x
    n_dev = lax.axis_size(axis_name)
    # my bottom rows go DOWN to the next device (they become its top halo)
    down_perm = [(i, i + 1) for i in range(n_dev - 1)]
    up_perm = [(i + 1, i) for i in range(n_dev - 1)]
    from_above = lax.ppermute(x[:, -halo:], axis_name, down_perm)
    from_below = lax.ppermute(x[:, :halo], axis_name, up_perm)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def _local_partial_conv(x, mask, kernel, bias, group_sizes, pad_w, axis_name):
    from text_segmentation_image_inpainting_tpu.ops.partial_conv import partial_conv2d

    k = kernel.shape[0]
    halo = k // 2
    x = halo_exchange_rows(x, halo, axis_name)
    mask = halo_exchange_rows(mask, halo, axis_name)
    # H already has its halo rows -> VALID in H, explicit zero pad in W
    y, new_mask = partial_conv2d(
        x, mask, kernel, bias, group_sizes=group_sizes, stride=1,
        padding=(0, pad_w), impl="xla",
    )
    return y, new_mask


def spatial_partial_conv2d(
    mesh: Mesh,
    x: jax.Array,
    mask: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    group_sizes: Sequence[int] | None = None,
    axis: str = DATA_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Partial conv over an H-sharded page batch.

    x: (N, H, W, Cin) with H divisible by the mesh axis size; kernel
    square, stride 1, torch-'same' geometry. Returns arrays with the
    same (H-sharded) layout.
    """
    if group_sizes is None:
        group_sizes = (x.shape[-1],)
    k = kernel.shape[0]
    pad_w = (k - 1) // 2
    fn = shard_map(
        partial(
            _local_partial_conv,
            group_sizes=tuple(group_sizes),
            pad_w=pad_w,
            axis_name=axis,
        ),
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),
            P(None, axis, None, None),
            P(),
            P(),
        ),
        out_specs=(P(None, axis, None, None), P(None, axis, None, None)),
    )
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), x.dtype)
    return fn(x, mask, kernel, bias)


def spatial_conv2d(
    mesh: Mesh,
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    axis: str = DATA_AXIS,
) -> jax.Array:
    """Plain stride-1 'same' conv over an H-sharded page batch."""
    from text_segmentation_image_inpainting_tpu.ops.conv import conv2d

    k = kernel.shape[0]
    halo = k // 2

    def local(x, kernel, bias):
        xh = halo_exchange_rows(x, halo, axis)
        return conv2d(xh, kernel, stride=1, padding=(0, halo), bias=bias)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(), P()),
        out_specs=P(None, axis, None, None),
    )
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), x.dtype)
    return fn(x, kernel, bias)
