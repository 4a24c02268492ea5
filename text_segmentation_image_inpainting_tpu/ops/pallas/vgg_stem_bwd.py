"""Fused VGG stem backward (dx-only) Pallas kernel + frozen-stem custom VJP.

THE round-5 config-4 item (VERDICT r4 task 3, docs/KERNEL_NOTES.md
round-5): ``bench/stem_fwdbwd_ab.py`` measured XLA's stem fwd+bwd at
34.5 ms against a 14.4 ms serial DMA+MXU lower bound for a fused kernel
("fusion can win; build it"). This module is that kernel, scoped by the
decisive simplification found there: **VGG is frozen in the inpainting
loss** (``losses/inpainting.py:90-104`` — the variables ride as
constants, gradients flow through the activations to the generator
only), so the backward the train step actually needs is **dx only**:

    g -> maxpool-grad -> relu-mask -> dgrad conv1 -> relu-mask
      -> dgrad conv0 -> dx

with conv0/conv1 activations recomputed in VMEM per row block. The
weight-grad GEMMs (the awkward shapes) drop out entirely, and the
512^2 x 64 intermediates that make XLA's lowering memory-bound
(~20 GB cost-model bytes) never touch HBM: the kernel reads packed x
(~37 MB) + the pool cotangent g (~134 MB), writes dx (~72 MB), and
everything else lives in VMEM.

Semantics notes:
  * Maxpool routing follows XLA's select-and-scatter: the cotangent
    goes to the FIRST maximum in row-major window order. Exact bf16
    ties against the (independently rounded) forward can route to a
    different in-window element than XLA would — measure-zero in f32,
    and a no-op for training at bf16 (both candidates are the max).
  * ``vgg_stem_frozen`` returns ZERO cotangents for w0/b0/w1/b1 by
    contract — callers must treat the stem weights as frozen, which is
    how every VGG16Features use in this repo works. Do NOT use it in a
    context that differentiates VGG weights.

Layout: row-pair packing as in ``vgg_stem.py`` — packed row i holds
image rows (2i, 2i+1); 64-channel tensors put the pair in lane halves
(128 lanes), the 3-channel image/dx in 8 lanes ([0:3] even row,
[4:7] odd row). Convs run as parity-packed flat-tap implicit GEMMs
(``make_weight_blocks``); conv0 (3->64) as a single K-packed im2col
GEMM (9 taps x 8 lanes = 72 of 128 K lanes).

Reference behavior: torchvision VGG16 ``features[0:5]`` as consumed by
the reference's perceptual loss (``models/loss.py`` [R], SURVEY.md
C7/C8); this kernel only changes HOW the gradient is computed, not
what it is.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from text_segmentation_image_inpainting_tpu.ops.pallas.vgg_stem import (
    PADW,
    make_weight_blocks,
)

# packed-row halos consumed by the recompute chain (see _kernel):
#   dx <- gz0(+-1) <- gz1(+-2) <- a0(+-3) <- x(+-4), plus one extra
#   zero row on top of x so every flat tap slice has a non-negative
#   start index (same trick as vgg_stem.py's +1 spare row). Halos come
#   from the NEIGHBOR grid blocks (auto-pipelined prev/cur/next
#   BlockSpecs with clamped index maps), which caps the halo at thp —
#   hence the thp >= 5 (block sizes 8/16/32) requirement.
_XTOP = 5
_XBOT = 4
_GHALO = 2


def _divisor_thp(h2: int) -> int:
    for cand in (32, 16, 8):
        if h2 % cand == 0:
            return cand
    raise ValueError(f"H/2 = {h2} must be divisible by 8 (H % 16 == 0)")


def pack_x(x: jax.Array) -> jax.Array:
    """(N, H, W, 3) -> (N, H/2, W + 2*PADW, 8) row-pair packed.

    Lanes [0:3] = image row 2i RGB, [4:7] = row 2i+1 RGB (lanes 3, 7
    zero). PADW zero columns per side; no row padding — row halos are
    assembled in-kernel from the neighbor grid blocks.
    """
    n, h, w, c = x.shape
    assert h % 2 == 0 and c == 3
    even = jnp.pad(x[:, 0::2], ((0, 0), (0, 0), (0, 0), (0, 1)))
    odd = jnp.pad(x[:, 1::2], ((0, 0), (0, 0), (0, 0), (0, 1)))
    p = jnp.concatenate([even, odd], axis=-1)  # (N, H2, W, 8)
    return jnp.pad(p, ((0, 0), (0, 0), (PADW, PADW), (0, 0)))


def unpack_dx(dxp: jax.Array, h: int, w: int) -> jax.Array:
    """(N, H/2, W + 2*PADW, 8) -> (N, H, W, 3)."""
    n = dxp.shape[0]
    d = dxp[:, :, PADW : PADW + w, :]
    even = d[..., 0:3]
    odd = d[..., 4:7]
    out = jnp.stack([even, odd], axis=2)  # (N, H2, 2, W, 3)
    return out.reshape(n, h, w, 3)


def make_w0_kpacked(w0: jax.Array, dtype) -> jax.Array:
    """(3, 3, 3, 64) HWIO -> (128, 128) K-packed conv0 GEMM block.

    K lane (pr*3 + di)*8 + h*4 + c  (pr/di = row/col tap, h = input row
    parity, c = RGB) -> N lane p*64 + o (p = output row parity). The
    image-row offset of that K lane relative to output parity p is
    dr = 2*(pr-1) + h - p; only |dr| <= 1 carries weight w0[dr+1, di].
    """
    blk = jnp.zeros((128, 128), jnp.float32)
    w0 = w0.astype(jnp.float32)
    for pr in range(3):
        for di in range(3):
            for h in range(2):
                for p in range(2):
                    dr = 2 * (pr - 1) + h - p
                    if -1 <= dr <= 1:
                        k0 = (pr * 3 + di) * 8 + h * 4
                        blk = blk.at[k0 : k0 + 3, p * 64 : p * 64 + 64].set(
                            w0[dr + 1, di]
                        )
    return blk.astype(dtype)


def make_wdx_blocks(w0: jax.Array, dtype) -> jax.Array:
    """(3, 3, 3, 64) -> (9, 128, 128) dgrad-conv0 blocks (N-sparse).

    Input gz0 parity-packed (K lane h*64 + o); output dx lane p*4 + m
    (matches pack_x's 8-lane layout). dgrad: dx[r, x, m] =
    sum gz0[r+dr, x+dc, o] * w0[1-dr, 1-dc, m, o]; block (pr, di) has
    dr = 2*(pr-1) + h - p, dc = di - 1.
    """
    blocks = jnp.zeros((9, 128, 128), jnp.float32)
    w0 = w0.astype(jnp.float32)
    for pr in range(3):
        for di in range(3):
            o = pr * 3 + di
            for h in range(2):
                for p in range(2):
                    dr = 2 * (pr - 1) + h - p
                    if -1 <= dr <= 1:
                        # (64 in-ch, 3 out-ch) slice: w0[1-dr, 2-di, m, o]^T
                        wslice = jnp.transpose(w0[1 - dr, 2 - di])  # (64, 3)
                        blocks = blocks.at[
                            o, h * 64 : h * 64 + 64, p * 4 : p * 4 + 3
                        ].set(wslice)
    return blocks.astype(dtype)


def _kernel(
    xp_ref,  # (1, thp, WP, 8) VMEM: packed-x block i
    xq_ref,  # (1, thp, WP, 8) VMEM: packed-x block i-1 (clamped)
    xn_ref,  # (1, thp, WP, 8) VMEM: packed-x block i+1 (clamped)
    gp_ref,  # (1, thp, W2, 64) VMEM: g block i-1 (clamped)
    gc_ref,  # (1, thp, W2, 64) VMEM: g block i
    gn_ref,  # (1, thp, W2, 64) VMEM: g block i+1 (clamped)
    w0k_ref,  # (128, 128) VMEM conv0 K-packed block
    w1_ref,  # (9, 128, 128) VMEM conv1 fwd blocks
    w1d_ref,  # (9, 128, 128) VMEM dgrad-conv1 blocks
    wdx_ref,  # (9, 128, 128) VMEM dgrad-conv0 blocks
    b0_ref,  # (1, 128) f32 conv0 bias pair
    b1_ref,  # (1, 128) f32 conv1 bias pair
    y_ref,  # out block (1, thp, WP, 8) f32: packed dx
    xbuf,  # scratch (thp+10, WP, 8): packed x rows (+1 zero spare)
    xim,  # scratch ((thp+6)*WP, 128): conv0 im2col (lanes 72:128 zero)
    gfull,  # scratch (thp+4, WP/2, 128): g assembled, lane-duplicated
    z0a,  # scratch (thp+8, WP, 128): a0 rows [-3, thp+3) at [1, thp+7)
    z1g,  # scratch (thp+6, WP, 128): z1 -> gz1 rows [-2, thp+2) at [1, thp+5)
    da0,  # scratch (thp+4, WP, 128): gz0 rows [-1, thp+1) at [1, thp+3)
    *,
    thp: int,
    wp: int,
    w2: int,
    h2: int,
    bpi: int,
    io_dtype,
):
    step = pl.program_id(0)
    i = step % bpi
    r0 = i * thp  # first output packed row (data coords)
    wpc = wp // 2

    m3 = (thp + 6) * wp  # conv0 output rows (a0 range)
    m2 = (thp + 4) * wp  # conv1 output rows (gz1 range)
    m1 = (thp + 2) * wp  # dgrad-conv1 output rows (gz0 range)
    m0 = thp * wp  # dx rows

    # ---- one-time zeroing (scratch persists across grid steps): spare
    # rows, the unused im2col K lanes, and gfull's pad column-pairs
    @pl.when(step == 0)
    def _zero_spares():
        xbuf[thp + 9] = jnp.zeros((wp, 8), io_dtype)
        xim[:, 72:128] = jnp.zeros((m3, 56), io_dtype)
        gfull[:, 0:8, :] = jnp.zeros((thp + 4, 8, 128), io_dtype)
        gfull[:, 8 + w2 : wpc, :] = jnp.zeros(
            (thp + 4, wpc - 8 - w2, 128), io_dtype
        )
        z0a[0] = jnp.zeros((wp, 128), io_dtype)
        z0a[thp + 7] = jnp.zeros((wp, 128), io_dtype)
        z1g[0] = jnp.zeros((wp, 128), io_dtype)
        z1g[thp + 5] = jnp.zeros((wp, 128), io_dtype)
        da0[0] = jnp.zeros((wp, 128), io_dtype)
        da0[thp + 3] = jnp.zeros((wp, 128), io_dtype)

    # ---- packed-x halo assembly: rows [r0-5, r0+thp+4) in data coords
    # (xbuf row 0 = data row r0-5; boundary blocks' halo rows come from
    # CLAMPED duplicate blocks and are zeroed below — conv SAME padding)
    xbuf[0:_XTOP] = xq_ref[0, thp - _XTOP :]
    xbuf[_XTOP : thp + _XTOP] = xp_ref[0]
    xbuf[thp + _XTOP : thp + _XTOP + _XBOT] = xn_ref[0, 0:_XBOT]

    @pl.when(i == 0)
    def _zero_top_x():
        xbuf[0:_XTOP] = jnp.zeros((_XTOP, wp, 8), io_dtype)

    @pl.when(i == bpi - 1)
    def _zero_bot_x():
        xbuf[thp + _XTOP : thp + _XTOP + _XBOT] = jnp.zeros(
            (_XBOT, wp, 8), io_dtype
        )

    # ---- conv0 recompute: z0/a0 over packed rows [-3, thp+3).
    # im2col via lane-slice scratch WRITES (a concat of slices whose
    # sublane offsets differ does not lower on Mosaic — writes relayout)
    xflat = xbuf[:].reshape((thp + 10) * wp, 8)
    for pr in range(3):
        for di in range(3):
            off = (pr + 1) * wp + di - 1  # xbuf row 0 = data row -5
            k0 = (pr * 3 + di) * 8
            xim[:, k0 : k0 + 8] = xflat[off : off + m3]
    acc0 = jnp.dot(xim[:], w0k_ref[:], preferred_element_type=jnp.float32)
    z0 = acc0 + b0_ref[0][None, :]

    # domain mask: data rows [0, h2) x data cols [PADW, PADW+W). x is
    # zero-padded so z0 = relu(b0) != 0 outside — mask a0 to zero there
    # so conv1 (and transitively everything downstream) sees exact SAME
    # zero padding. All masks here are built ARITHMETICALLY (clip/sign
    # on int iotas) — Mosaic cannot relayout/broadcast i1 vectors.
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (thp + 6, wp, 1), 0) + (r0 - 3)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (thp + 6, wp, 1), 1)
    maskf = (
        jnp.clip(rows3 + 1, 0, 1)
        * jnp.clip(h2 - rows3, 0, 1)
        * jnp.clip(cols3 - (PADW - 1), 0, 1)
        * jnp.clip(wp - PADW - cols3, 0, 1)
    ).astype(jnp.float32)
    z03 = z0.reshape(thp + 6, wp, 128)
    z0a[1 : thp + 7] = (jnp.maximum(z03, 0.0) * maskf).astype(io_dtype)

    # ---- conv1 recompute: z1 over packed rows [-2, thp+2)
    a0flat = z0a[:].reshape((thp + 8) * wp, 128)
    acc1 = jnp.zeros((m2, 128), jnp.float32)
    for pr in range(3):
        for di in range(3):
            off = (pr + 1) * wp + di - 1  # z0a row 0 = spare (data -4)
            acc1 += jnp.dot(
                a0flat[off : off + m2],
                w1_ref[pr * 3 + di],
                preferred_element_type=jnp.float32,
            )
    z1 = (acc1 + b1_ref[0][None, :]).astype(io_dtype)

    # ---- pool-grad + relu mask -> gz1, fully elementwise (rolls +
    # arithmetic blends — no concat/stack/strided slicing, none of
    # which lower on Mosaic for this mix of offsets/dtypes).
    #
    # Flat geometry: lane halves = image-row parity of the packed pair,
    # sublane pairs (2k, 2k+1) = image-column pairs. A pool window's 4
    # candidates in XLA's select-and-scatter order are therefore
    #   c0 = (lane lo, sub even), c1 = (lane lo, sub odd),
    #   c2 = (lane hi, sub even), c3 = (lane hi, sub odd)
    # and every candidate sees its 3 partners via a parity sublane roll
    # (vs), a 64-lane roll (vl), and both (vd).
    #
    # g assembly: write the three auto-piped blocks into gfull at col-
    # pairs [8, 8+W2), duplicated on both lane halves; boundary blocks'
    # out-of-image halo rows zeroed (their BlockSpec index is clamped,
    # so the refs hold duplicate data there, not zeros).
    for lane0 in (0, 64):
        gfull[0:_GHALO, 8 : 8 + w2, lane0 : lane0 + 64] = gp_ref[
            0, thp - _GHALO :
        ]
        gfull[_GHALO : thp + _GHALO, 8 : 8 + w2, lane0 : lane0 + 64] = gc_ref[0]
        gfull[thp + _GHALO : thp + 2 * _GHALO, 8 : 8 + w2, lane0 : lane0 + 64] = (
            gn_ref[0, :_GHALO]
        )

    @pl.when(i == 0)
    def _zero_top_halo():
        gfull[0:_GHALO] = jnp.zeros((_GHALO, wpc, 128), io_dtype)

    @pl.when(i == bpi - 1)
    def _zero_bot_halo():
        gfull[thp + _GHALO : thp + 2 * _GHALO] = jnp.zeros(
            (_GHALO, wpc, 128), io_dtype
        )

    a1v = jnp.maximum(z1, 0).astype(jnp.float32)  # (m2, 128)
    # f32 0/1 parity column and lane-half row (broadcast-safe as floats)
    pf = (
        jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) % 2
    ).astype(jnp.float32)
    hf = jnp.clip(
        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) - 63, 0, 1
    ).astype(jnp.float32)
    rollm = pltpu.roll(a1v, m2 - 1, axis=0)  # next sublane (shift >= 0)
    rollp = pltpu.roll(a1v, 1, axis=0)  # prev sublane
    vs = rollm * (1.0 - pf) + rollp * pf  # in-pair column partner
    vl = pltpu.roll(a1v, 64, axis=1)  # row partner (other lane half)
    vd = pltpu.roll(vs, 64, axis=1)  # diagonal partner
    pmax = jnp.maximum(a1v, vs)
    mdup = jnp.maximum(pmax, pltpu.roll(pmax, 64, axis=1))  # window max

    def _eq(v):
        # every candidate is <= the window max, so mdup - v >= 0 and
        # sign() gives an exact arithmetic equality indicator
        return 1.0 - jnp.sign(mdup - v)

    # first-max priority (c0 > c1 > c2 > c3): a candidate routes iff no
    # higher-priority candidate also equals the window max:
    #   lane-hi suppressed by any lane-lo claim (vl or vd), sub-odd
    #   suppressed by its in-pair even partner (vs)
    hp = jnp.maximum(hf * jnp.maximum(_eq(vl), _eq(vd)), pf * _eq(vs))
    relu_m = jnp.sign(a1v)  # a1v = relu(z1) >= 0: exact 0/1, == (z1 > 0)
    sel = _eq(a1v) * (1.0 - hp) * relu_m

    gq = jnp.repeat(
        gfull[:].reshape(m2 // 2, 128).astype(jnp.float32), 2, axis=0
    )
    z1g[1 : thp + 5] = (gq * sel).astype(io_dtype).reshape(thp + 4, wp, 128)

    # ---- dgrad conv1 -> gz0 over packed rows [-1, thp+1)
    gz1flat = z1g[:].reshape((thp + 6) * wp, 128)
    acc2 = jnp.zeros((m1, 128), jnp.float32)
    for pr in range(3):
        for di in range(3):
            off = (pr + 1) * wp + di - 1  # z1g row 0 = spare (data -3)
            acc2 += jnp.dot(
                gz1flat[off : off + m1],
                w1d_ref[pr * 3 + di],
                preferred_element_type=jnp.float32,
            )
    # relu mask via sign(a0) (a0 = relu(z0) >= 0, domain-masked — kills
    # both relu-flat positions AND everything outside the valid domain)
    a0_r1 = z0a[3 : thp + 5].reshape(m1, 128).astype(jnp.float32)
    gz0 = (acc2 * jnp.sign(a0_r1)).astype(io_dtype)
    da0[1 : thp + 3] = gz0.reshape(thp + 2, wp, 128)

    # ---- dgrad conv0 -> dx over packed rows [0, thp)
    gz0flat = da0[:].reshape((thp + 4) * wp, 128)
    acc3 = jnp.zeros((m0, 128), jnp.float32)
    for pr in range(3):
        for di in range(3):
            off = (pr + 1) * wp + di - 1  # da0 row 0 = spare (data -2)
            acc3 += jnp.dot(
                gz0flat[off : off + m0],
                wdx_ref[pr * 3 + di],
                preferred_element_type=jnp.float32,
            )
    y_ref[0] = acc3.reshape(thp, wp, 128)[:, :, 0:8].astype(y_ref.dtype)


def stem_dx_packed(
    xp: jax.Array,
    g: jax.Array,
    w0: jax.Array,
    b0: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    *,
    thp: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Packed-input fused stem backward: dx for the frozen VGG stem.

    Args:
      xp: ``pack_x(x)`` — (N, H2, WP, 8), the stem input (already
        ImageNet-normalized, compute dtype).
      g: (N, H2, W2, 64) cotangent of the pool1 output.
      w0, b0, w1, b1: conv0/conv1 HWIO weights + biases (any float
        dtype; blocks are built in the compute dtype).
    Returns:
      (N, H2, WP, 8) float32 packed dx (``unpack_dx`` to image layout).
    """
    n, h2, wp, _ = xp.shape
    w = wp - 2 * PADW
    w2 = w // 2
    assert wp % 16 == 0, "W must be a multiple of 16"
    assert g.shape == (n, h2, w2, 64), (g.shape, (n, h2, w2, 64))
    if thp is None:
        thp = _divisor_thp(h2)
    assert h2 % thp == 0
    bpi = h2 // thp
    dtype = xp.dtype

    w0k = make_w0_kpacked(w0, dtype)
    w1blk = make_weight_blocks(w1, dtype)
    w1d = jnp.transpose(w1[::-1, ::-1], (0, 1, 3, 2))
    w1dblk = make_weight_blocks(w1d, dtype)
    wdxblk = make_wdx_blocks(w0, dtype)
    b0p = jnp.concatenate([b0, b0]).reshape(1, 128).astype(jnp.float32)
    b1p = jnp.concatenate([b1, b1]).reshape(1, 128).astype(jnp.float32)

    kern = functools.partial(
        _kernel,
        thp=thp,
        wp=wp,
        w2=w2,
        h2=h2,
        bpi=bpi,
        io_dtype=dtype,
    )

    def _gmap(delta):
        def _map(s):
            i = s % bpi
            return (s // bpi, jnp.clip(i + delta, 0, bpi - 1), 0, 0)

        return _map

    gspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, thp, w2, 64), _gmap(d), memory_space=pltpu.VMEM
    )
    xspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, thp, wp, 8), _gmap(d), memory_space=pltpu.VMEM
    )
    itemsize = jnp.dtype(dtype).itemsize
    flops = 2 * n * h2 * wp * 9 * 128 * 128 * 3  # conv1 + dgrads (dominant)
    dxp = pl.pallas_call(
        kern,
        grid=(n * bpi,),
        in_specs=[
            xspec(0),
            xspec(-1),
            xspec(+1),
            gspec(-1),
            gspec(0),
            gspec(+1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, thp, wp, 8),
            lambda s, b=bpi: (s // b, s % b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, wp, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((thp + 10, wp, 8), dtype),
            pltpu.VMEM(((thp + 6) * wp, 128), dtype),
            pltpu.VMEM((thp + 4, wp // 2, 128), dtype),
            pltpu.VMEM((thp + 8, wp, 128), dtype),
            pltpu.VMEM((thp + 6, wp, 128), dtype),
            pltpu.VMEM((thp + 4, wp, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                n * h2 * wp * 8 * itemsize * 3
                + n * h2 * w2 * 64 * itemsize * 3
                + n * h2 * wp * 8 * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, xp, g, g, g, w0k, w1blk, w1dblk, wdxblk, b0p, b1p)
    return dxp


def stem_forward_xla(x, w0, b0, w1, b1, dtype):
    """Stock XLA stem fwd, bit-matching flax nn.Conv/relu/max_pool.

    flax promotes x/kernel/bias to the module dtype before the conv;
    replicated here so ``vgg_stem_frozen`` is a drop-in for
    ``VGG16Features`` features[0:5] (models/vgg.py).
    """
    y = x.astype(dtype)
    for wk, bk in ((w0, b0), (w1, b1)):
        y = lax.conv_general_dilated(
            y,
            wk.astype(dtype),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bk.astype(dtype)
        y = jnp.maximum(y, 0)
    # -inf init (any float dtype) — bit-matches flax nn.max_pool and is
    # what reduce_window's reverse-mode rule requires
    return lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def vgg_stem_frozen(x, w0, b0, w1, b1, dtype=jnp.bfloat16, interpret=False):
    """conv0-relu-conv1-relu-pool1 with a fused Pallas dx-only backward.

    FROZEN-WEIGHT CONTRACT: the VJP returns zero cotangents for
    w0/b0/w1/b1. Only use where the VGG trunk is a constant (every use
    in this repo: losses/inpainting.py, train/evaluate.py).
    """
    return stem_forward_xla(x, w0, b0, w1, b1, dtype)


def _stem_fwd(x, w0, b0, w1, b1, dtype, interpret):
    out = stem_forward_xla(x, w0, b0, w1, b1, dtype)
    return out, (x, w0, b0, w1, b1)


def _stem_bwd(dtype, interpret, res, gy):
    x, w0, b0, w1, b1 = res
    n, h, w, _ = x.shape
    xp = pack_x(x.astype(dtype))
    dxp = stem_dx_packed(
        xp, gy.astype(dtype), w0, b0, w1, b1, interpret=interpret
    )
    dx = unpack_dx(dxp, h, w).astype(x.dtype)
    zeros = tuple(jnp.zeros_like(a) for a in (w0, b0, w1, b1))
    return (dx,) + zeros


vgg_stem_frozen.defvjp(_stem_fwd, _stem_bwd)
