"""Single-pass Pallas TPU kernel for the depthwise-conv weight gradient.

Status: RECORDED ABLATION, off by default (``ops/depthwise.py``,
docs/KERNEL_NOTES.md round 3). The hypothesis was that XLA lowers the
depthwise weight gradient (``feature_group_count == C``) as a
batch-group-counted convolution with poor MXU utilisation, explaining
the encoder's 2.9x bwd:fwd ratio. The measured A/B/C comparison on the
v5e refuted it: the ratio is ordinary dgrad+wgrad+BN-grad stacking,
and this kernel ran ~1 ms/layer SLOWER than XLA's lowering. Kept with
its parity tests so the next attempt starts from working code instead
of a prose note.

The reformulation: for a stride-1 depthwise conv with dilation d,

    dW[ki, kj, c] = sum_{n, oh, ow} x_pad[n, oh + ki*d, ow + kj*d, c]
                                    * dy[n, oh, ow, c]

Each tap (ki, kj) is an elementwise multiply of a SHIFTED slab of
``x_pad`` against ``dy``, reduced over (n, h, w) — pure VPU work that
reads x and dy from HBM exactly ONCE (XLA-level versions of the same
trick read them k*k times; that measured no better than the status
quo). Following the flattened-tap idiom of ``partial_conv_kernel.py``:
rows are flattened to one (rows*W_pad, C) axis so every tap is a
contiguous sublane slice at offset ``ki*d*W_pad + kj*d``; the
wrap-around columns at row ends multiply dy's zero-padding columns and
contribute nothing.

Grid: ``(C_blocks, N*H_blocks)`` — channel-block outermost so the
(k*k, TC) f32 accumulator block is revisited across all row blocks of
all images and written back once per channel block. x rows stream
through a double-buffered manual DMA (halo of ``d*(k-1)`` rows between
consecutive blocks makes plain BlockSpec blocking inexpressible); dy
blocks tile exactly and use the auto-pipelined BlockSpec path.

Scope: stride 1, square odd kernel, torch-"same" symmetric padding
``p = d*(k-1)/2`` (every stride-1 depthwise conv in the MobileNetV2
encoder, dilations 1/2/4). Callers fall back to XLA outside that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TC = 128  # channel tile = one lane register width


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _kernel(
    xp_hbm,  # (N, HPP, WP8, CP) HBM: padded input rows
    dy_ref,  # (1, TH, WP8, TC) VMEM block: padded cotangent rows
    dw_ref,  # out: (k*k, TC) f32 VMEM block, revisited over nh
    buf0,  # scratch (R+1, WP8, TC): x rows, ping (+1 spare row, see below)
    buf1,  # scratch (R+1, WP8, TC): x rows, pong
    sems,  # DMA sems (2,)
    *,
    k: int,
    d: int,
    th: int,
    h_blocks: int,
):
    cb = pl.program_id(0)
    nh = pl.program_id(1)
    r = th + d * (k - 1)
    wp8 = buf0.shape[1]

    def dma_for(step, buf_ref):
        n = step // h_blocks
        h = step % h_blocks
        return pltpu.make_async_copy(
            xp_hbm.at[n, pl.ds(h * th, r), :, pl.ds(cb * _TC, _TC)],
            buf_ref.at[pl.ds(0, r)],
            sems.at[step % 2],
        )

    # Double-buffered x-row streaming (halo rows re-read from HBM; the
    # overlap is d*(k-1)/th of the stream and stays small for th >= 16).
    @pl.when(nh == 0)
    def _warmup():
        # the spare row (never DMA'd) backs the last taps' flat-slice
        # overrun; it only ever multiplies dy's zero columns, but must
        # not hold NaN garbage (NaN * 0 = NaN)
        buf0[r] = jnp.zeros_like(buf0[r])
        buf1[r] = jnp.zeros_like(buf1[r])
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dma_for(0, buf0).start()

    nh_total = pl.num_programs(1)

    def _accumulate(buf_ref):
        x_flat = buf_ref[:].reshape((r + 1) * wp8, _TC)
        dy_flat = dy_ref[0].reshape(th * wp8, _TC).astype(jnp.float32)
        taps = []
        for ki in range(k):
            for kj in range(k):
                off = ki * d * wp8 + kj * d
                slab = x_flat[off : off + th * wp8].astype(jnp.float32)
                taps.append(jnp.sum(slab * dy_flat, axis=0))
        dw_ref[:] += jnp.stack(taps)

    @pl.when(nh % 2 == 0)
    def _even():
        dma_for(nh, buf0).wait()

        @pl.when(nh + 1 < nh_total)
        def _():
            dma_for(nh + 1, buf1).start()

        _accumulate(buf0)

    @pl.when(nh % 2 == 1)
    def _odd():
        dma_for(nh, buf1).wait()

        @pl.when(nh + 1 < nh_total)
        def _():
            dma_for(nh + 1, buf0).start()

        _accumulate(buf1)


def supported(stride, dilation, kernel_shape) -> bool:
    """Kernel scope: square odd-k stride-1 depthwise with symmetric
    torch-'same' padding and at least one full channel tile."""
    kh, kw, cin_per_group, c = kernel_shape
    return (
        stride == (1, 1)
        and dilation[0] == dilation[1]
        and kh == kw
        and kh % 2 == 1
        and cin_per_group == 1
        and c >= _TC
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def depthwise_wgrad(x, dy, k: int, d: int, interpret: bool = False):
    """dW (k, k, 1, C) f32 for a stride-1 'same'-padded depthwise conv.

    Args:
      x: (N, H, W, C) conv input (any float dtype).
      dy: (N, H, W, C) output cotangent (stride 1 + same pad -> same shape).
      k: square kernel size (odd).
      d: dilation.
    """
    n, h, w, c = x.shape
    assert dy.shape == x.shape, (x.shape, dy.shape)
    p = d * (k - 1) // 2
    cp = _round_up(c, _TC)
    # row block: amortize the halo (d*(k-1) rows) while keeping
    # 2 x-buffers + 2 dy blocks within a few MB of VMEM
    th = min(32, _round_up(h, 8))
    h_blocks = pl.cdiv(h, th)
    hp = h_blocks * th  # dy rows padded; x needs hp + 2p
    wp8 = _round_up(w + 2 * p, 8)

    xp = jnp.zeros((n, hp + 2 * p, wp8, cp), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, p, p, 0))
    dyp = jnp.zeros((n, hp, wp8, cp), dy.dtype)
    # dy sits at column 0: tap kj reads x columns [kj*d, kj*d + W) of the
    # padded row, exactly the torch-'same' window for output column ow
    dyp = jax.lax.dynamic_update_slice(dyp, dy, (0, 0, 0, 0))

    r = th + d * (k - 1)
    dw = pl.pallas_call(
        functools.partial(_kernel, k=k, d=d, th=th, h_blocks=h_blocks),
        grid=(cp // _TC, n * h_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, th, wp8, _TC),
                lambda cb, nh: (nh // h_blocks, nh % h_blocks, 0, cb),
            ),
        ],
        out_specs=pl.BlockSpec((k * k, _TC), lambda cb, nh: (0, cb)),
        out_shape=jax.ShapeDtypeStruct((k * k, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r + 1, wp8, _TC), x.dtype),
            pltpu.VMEM((r + 1, wp8, _TC), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, dyp)
    return dw[:, :c].reshape(k, k, 1, c)
