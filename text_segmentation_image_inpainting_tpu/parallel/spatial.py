"""Spatial (H-axis) sharding with conv halo exchange — the framework's
sequence/context-parallel analogue (SURVEY.md section 2.2).

The reference has no attention and no sequence dim; its scale axis is
image resolution. For pages too large for one chip, shard H over the
mesh. Two complementary full-model paths, both bit-matching the
unsharded forward on an 8-virtual-CPU mesh (tests/test_spatial_parallel.py):

1. **Explicit halo exchange** (:func:`spatial_inpaint_unet`): the
   unmodified ``InpaintUNet.apply`` traces inside ``shard_map`` under
   ``ops.partial_conv.spatial_axis`` — every partial conv (stride 1 AND
   stride 2, any dilation) exchanges k//2-row halos with ``lax.ppermute``
   (ICI neighbor traffic, no all-gather); nearest upsample and BN are
   shard-local. ``ppermute`` leaves ring-end buffers zero, reproducing
   the global zero padding exactly.
2. **GSPMD annotation** (:func:`spatial_pipeline_run`): jit the WHOLE
   fused segment→dilate→inpaint pipeline with H-sharded in/out
   shardings and let XLA's spatial partitioner insert the halo
   exchanges — covers the flax-conv segmentation encoder too. This is
   the scaling-book recipe: annotate, let XLA place collectives.

Leaf-op helpers (:func:`spatial_partial_conv2d`, :func:`spatial_conv2d`)
remain for kernel-level work.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from text_segmentation_image_inpainting_tpu.parallel.mesh import DATA_AXIS


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate ``halo`` rows from each H-neighbor: (N,Hl,W,C) ->
    (N, Hl+2*halo, W, C). Ring ends receive zeros (= global zero pad).

    Symmetric-halo wrapper over the one ring implementation
    (``ops.partial_conv._halo_exchange_rows``, which also serves the
    asymmetric stride-2 halos) — a single place owns the ppermute logic."""
    if halo <= 0:
        return x
    from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
        _halo_exchange_rows,
    )

    return _halo_exchange_rows(x, halo, halo, axis_name)


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


def spatial_inpaint_unet(
    mesh: Mesh,
    unet,
    variables,
    x: jax.Array,
    mask: jax.Array,
    *,
    axis: str = DATA_AXIS,
) -> jax.Array:
    """Full InpaintUNet forward with H sharded over ``axis``.

    The UNMODIFIED model traces inside ``shard_map``; the
    ``spatial_axis`` context makes every ``partial_conv2d`` (stride-2
    encoder convs included) halo-exchange instead of zero-pad in H.
    Requires ``unet.fuse_up=False`` (the literal upsample→concat→conv
    composition — parameters are identical either way) and local H
    divisible by ``2**unet.depth``.

    Why the assertion stays (round-3 disposition): the phase-fused
    decoder operates in half-res phase space, where one output row
    interleaves BOTH phases — its halo is a 1-row PHASE halo whose
    contents depend on the phase parity of the shard boundary, i.e. a
    correct exchange needs parity-conditional selector weights per
    shard edge. That is real complexity for a path that already has a
    production-scale alternative: :func:`spatial_pipeline_run` shards
    the FUSED model via GSPMD, and
    ``tests/test_spatial_parallel.py::test_spatial_gspmd_fused_512_compiles_with_halo_collectives``
    proves at 8x512² that XLA stitches it with collective-permutes
    (halo traffic), not all-gathers. Explicit shard_map halo exchange
    remains for the unfused model (useful for kernel-level control);
    the fused model scales spatially through GSPMD.

    x: (N, H, W, 3), mask: (N, H, W, 1); returns (N, H, W, 3), all
    H-sharded with the same layout.
    """
    from text_segmentation_image_inpainting_tpu.ops.partial_conv import spatial_axis

    assert not unet.fuse_up, (
        "spatial_inpaint_unet needs InpaintUNet(fuse_up=False) — the fused "
        "half-res phase path is single-device-only; params are identical"
    )
    n_dev = mesh.shape[axis]
    assert (x.shape[1] // n_dev) % (1 << unet.depth) == 0, (
        f"local H {x.shape[1]}/{n_dev} must be divisible by 2**depth={1 << unet.depth}"
    )

    def local_fn(x, mask, variables):
        with spatial_axis(axis):
            return unet.apply(variables, x, mask)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
    )
    return fn(x, mask, variables)


def spatial_pipeline_run(
    mesh: Mesh,
    pipe,
    seg_variables,
    unet_variables,
    pages: jax.Array,
    *,
    axis: str = DATA_AXIS,
):
    """Whole fused pipeline (TextSegmenter + dilate + InpaintUNet) with
    page H sharded over ``axis`` via GSPMD annotation — XLA's spatial
    partitioner inserts the conv halo exchanges (including through the
    flax-conv MobileNetV2 encoder, bilinear resizes and the max-pool
    dilation). Bit-matches the unsharded ``pipe.run``.

    Returns (clean_pages, text_mask), H-sharded.
    """
    import jax as _jax

    sh = NamedSharding(mesh, P(None, axis, None, None))
    rep = NamedSharding(mesh, P())
    fn = _jax.jit(pipe.run, in_shardings=(rep, rep, sh), out_shardings=(sh, sh))
    return fn(seg_variables, unet_variables, _jax.device_put(pages, sh))


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
