"""Fused VGG stem tail: relu(z0) -> conv3x3(64->64)+b -> relu -> maxpool2x2.

STATUS: parity-tested infrastructure, NOT wired into VGG16Features.
Measured on the deployment chip (docs/KERNEL_NOTES.md round 3 cont.):
7.83 ms vs XLA's 8.29 at 2N=16 x 512^2 bf16 — the platform's REAL
streaming bandwidth is ~150-190 GB/s (not the 819 GB/s datasheet
number), XLA's stock lowering already sits at that roofline, and Pallas
DMA does not overlap with MXU compute on this toolchain, so the 2x
traffic reduction this fusion delivers only breaks even. Kept green for
a part where either of those facts changes.

This kernel computes the whole tail of the stem in one pass over
VMEM-resident row blocks — the conv1 output and its relu NEVER touch
HBM, and the pool output (a quarter of the input) is the only write.

Layout: the kernel consumes a ROW-PAIR-PACKED input
    z0p[n, i, 16 + x, 0:64]   = z0[n, 2*i,   x, :]
    z0p[n, i, 16 + x, 64:128] = z0[n, 2*i+1, x, :]
(one packed-row halo top+bottom, 16 zero columns left+right) so every
VMEM tile is a dense 128-lane array — no channel padding waste — and
the 2x2 pool pairs are lane halves (rows) / adjacent-sublane lane
regroups (columns).

Conv as a parity-packed flat-tap implicit GEMM (same flat-pixel trick
as partial_conv_kernel.py): with both output-row parities packed into
the GEMM's N dimension, the 3x3 conv is NINE (M, 128) @ (128, 128)
matmuls — full K and N occupancy on the MXU, where XLA's lowering of
the 64-channel conv runs half-empty.  The half-zero edge weight blocks
cost 2x the minimal FLOPs but run at ~4x XLA's effective rate.

Reference: torchvision VGG16 features[0:5] as used by the reference's
perceptual loss (``models/loss.py`` [R], SURVEY.md C7/C8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# geometry constants shared by pack/kernel/crop:
#   data columns live at [PADW, PADW + W); output col c sits at flat
#   column x = c + PADW - 2, so column pool pairs (x even, x odd) are
#   exactly (2cp, 2cp+1) and the pooled crop starts at pair PADW//2 - 1
PADW = 16


def _divisor_thp(half_h: int) -> int:
    for cand in (8, 4, 2, 1):
        if half_h % cand == 0:
            return cand
    return 1


def pack_rows(z0: jax.Array) -> jax.Array:
    """(N, H, W, 64) -> (N, H//2 + 2, W + 2*PADW, 128) row-pair packing."""
    n, h, w, c = z0.shape
    assert h % 2 == 0 and c == 64
    p = z0.reshape(n, h // 2, 2, w, c)
    p = p.transpose(0, 1, 3, 2, 4).reshape(n, h // 2, w, 2 * c)
    return jnp.pad(p, ((0, 0), (1, 1), (PADW, PADW), (0, 0)))


def unpack_rows(z0p: jax.Array) -> jax.Array:
    """Inverse of pack_rows (drops halo rows and column pad)."""
    n, hp2, wp, c2 = z0p.shape
    h2, w = hp2 - 2, wp - 2 * PADW
    p = z0p[:, 1 : 1 + h2, PADW : PADW + w, :]
    p = p.reshape(n, h2, w, 2, 64).transpose(0, 1, 3, 2, 4)
    return p.reshape(n, 2 * h2, w, 64)


def make_weight_blocks(w1: jax.Array, dtype) -> jax.Array:
    """(3, 3, 64, 64) HWIO -> (9, 128, 128) parity-packed GEMM blocks.

    Block o = pr*3 + di (pr = packed-row tap, di = column tap) maps the
    128 input lanes (even row | odd row of packed row ``pr``) to the 128
    output lanes (conv row parity 0 | parity 1):

        K 0:64 (even row, image row offset 2pr-2 / 2pr-3 per parity)
        K 64:128 (odd row,  image row offset 2pr-1 / 2pr-2 per parity)

    only offsets in {-1, 0, 1} carry weight; the rest stay zero.
    """
    blocks = jnp.zeros((9, 128, 128), jnp.float32)
    w1 = w1.astype(jnp.float32)
    for pr in range(3):
        for di in range(3):
            o = pr * 3 + di
            # parity 0 output (N lanes 0:64): even-row dr = 2pr - 2, odd dr = 2pr - 1
            for half, dr in ((0, 2 * pr - 2), (1, 2 * pr - 1)):
                if -1 <= dr <= 1:
                    blocks = blocks.at[o, 64 * half : 64 * half + 64, 0:64].set(
                        w1[dr + 1, di]
                    )
            # parity 1 output (N lanes 64:128): even dr = 2pr - 3, odd dr = 2pr - 2
            for half, dr in ((0, 2 * pr - 3), (1, 2 * pr - 2)):
                if -1 <= dr <= 1:
                    blocks = blocks.at[o, 64 * half : 64 * half + 64, 64:128].set(
                        w1[dr + 1, di]
                    )
    return blocks.astype(dtype)


def _kernel(
    zp_hbm,  # (N, H2+2, WP, 128) HBM, row-pair packed (pack_rows layout)
    w_ref,  # (9, 128, 128) VMEM parity-packed weight blocks
    b_ref,  # (1, 128) VMEM f32: conv bias duplicated on both parity halves
    y_ref,  # out block (1, THP, W/2, 64)
    buf0,  # scratch (R, WP, 128): raw packed rows, ping
    buf1,  # scratch (R, WP, 128): raw packed rows, pong
    xm_scr,  # scratch (R+1, WP, 128): relu'd rows (+1 spare for flat-tap overrun)
    sems,  # DMA semaphores (2,)
    *,
    thp: int,
    wp: int,
    w_half: int,
    blocks_per_img: int,
    acc_dtype,
):
    step = pl.program_id(0)
    total = pl.num_programs(0)
    r = thp + 2

    def dma_for(s, buf):
        n = s // blocks_per_img
        i = s % blocks_per_img
        return pltpu.make_async_copy(
            zp_hbm.at[n, pl.ds(i * thp, r)], buf, sems.at[s % 2]
        )

    def _prep(buf):
        # relu once per block into the shared scratch (the GEMM reads
        # each element 9x; doing relu on the fly would 9x the VPU work)
        xm_scr[0:r] = jnp.maximum(buf[:], 0)

    @pl.when(step == 0)
    def _warmup():
        dma_for(0, buf0).start()

    @pl.when(step % 2 == 0)
    def _even():
        dma_for(step, buf0).wait()

        @pl.when(step + 1 < total)
        def _():
            dma_for(step + 1, buf1).start()

        _prep(buf0)

    @pl.when(step % 2 == 1)
    def _odd():
        dma_for(step, buf1).wait()

        @pl.when(step + 1 < total)
        def _():
            dma_for(step + 1, buf0).start()

        _prep(buf1)

    # parity-packed flat-tap GEMM: acc[p, 0:64] = conv row 2j, acc[p,
    # 64:128] = conv row 2j+1, for flat p = j*WP + x, output col c = x - 2
    # - wait: col mapping is c = x - (PADW - 2); see module docstring
    pw_flat = thp * wp
    xm_flat = xm_scr[:].reshape((r + 1) * wp, 128)
    acc = jnp.zeros((pw_flat, 128), acc_dtype)
    for pr in range(3):
        for di in range(3):
            off = pr * wp + di + 1
            acc += jnp.dot(
                xm_flat[off : off + pw_flat],
                w_ref[pr * 3 + di],
                preferred_element_type=acc_dtype,
            )

    # epilogue: bias + relu + 2x2 max pool, all in VMEM
    pair = jnp.maximum(acc + b_ref[0][None, :].astype(acc_dtype), 0)
    rowmax = jnp.maximum(pair[:, 0:64], pair[:, 64:128])  # (thp*wp, 64)
    # adjacent-sublane pair reduce (Mosaic supports this reshape+reduce;
    # a (A, 64) -> (A/2, 128) shape cast does NOT lower)
    colmax = jnp.max(rowmax.reshape(pw_flat // 2, 2, 64), axis=1)
    start = PADW // 2 - 1
    y = colmax.reshape(thp, wp // 2, 64)[:, start : start + w_half]
    y_ref[0] = y.astype(y_ref.dtype)


def stem_pool_packed(
    z0p: jax.Array, w1: jax.Array, b1: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Packed-input fused tail: (N, H2+2, WP, 128) -> (N, H2, W/2, 64).

    ``z0p`` is ``pack_rows(z0)`` (or produced directly in that layout);
    returns maxpool2x2(relu(conv3x3(relu(z0), w1) + b1)).
    """
    n, hp2, wp, c2 = z0p.shape
    assert c2 == 128 and wp % 16 == 0
    h2 = hp2 - 2
    w = wp - 2 * PADW
    thp = _divisor_thp(h2)
    blocks_per_img = h2 // thp
    r = thp + 2
    dtype = z0p.dtype

    wblk = make_weight_blocks(w1, dtype)
    b_pair = jnp.concatenate([b1, b1]).reshape(1, 128).astype(jnp.float32)

    kern = functools.partial(
        _kernel,
        thp=thp,
        wp=wp,
        w_half=w // 2,
        blocks_per_img=blocks_per_img,
        acc_dtype=jnp.float32,
    )
    itemsize = jnp.dtype(dtype).itemsize
    flops = 2 * n * h2 * wp * 9 * 128 * 128
    y = pl.pallas_call(
        kern,
        grid=(n * blocks_per_img,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, thp, w // 2, 64),
            lambda s, b=blocks_per_img: (s // b, s % b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, w // 2, 64), dtype),
        scratch_shapes=[
            pltpu.VMEM((r, wp, 128), dtype),
            pltpu.VMEM((r, wp, 128), dtype),
            pltpu.VMEM((r + 1, wp, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                n * hp2 * wp * 128 * itemsize * r // max(thp, 1)
                + n * h2 * (w // 2) * 64 * itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(z0p, wblk, b_pair)
    return y


def stem_pool_reference(z0: jax.Array, w1: jax.Array, b1: jax.Array) -> jax.Array:
    """Pure-XLA oracle: maxpool2x2(relu(conv3x3(relu(z0)) + b))."""
    z0r = jnp.maximum(z0, 0)
    z1 = lax.conv_general_dilated(
        z0r,
        w1.astype(z0r.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(z0r.dtype)
    a = jnp.maximum(z1, 0)
    return lax.reduce_window(
        a, -jnp.inf if a.dtype == jnp.float32 else jnp.finfo(a.dtype).min,
        lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
