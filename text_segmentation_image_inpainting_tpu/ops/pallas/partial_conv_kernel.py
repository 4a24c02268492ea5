"""Fused partial-convolution Pallas TPU kernel.

THE native component this framework owes (SURVEY.md section 2 /
BASELINE.json:5): the reference emulates partial convolution with two
stock convs (feature conv over X*M plus a frozen all-ones conv for
sum(M)); here masked multiply, implicit-GEMM convolution, 1/sum(M)
renormalization, bias, zeroing of fully-masked windows AND the binary
mask update all happen in ONE pass over VMEM-resident tiles.

Kernel shape (see /opt/skills/guides/pallas_guide.md):
  * grid = (N * H_blocks, Cout_tiles); the Cout axis iterates fastest,
    so each row block is DMA'd from HBM exactly once and reused by
    every Cout tile.
  * inputs are packed host-side into ONE array [x | mask | 0-pad] whose
    lane (channel) dim is a 128 multiple and whose W dim is an 8
    multiple — Mosaic requires DMA source slices to be tile-aligned in
    the last two dims, and the mask's 1-2 channels could never satisfy
    that alone.
  * conv = sum over the k*k taps of (TH*W, Cin) @ (Cin, TC) matmuls on
    the MXU with fp32 accumulation; the masked multiply X*M happens in
    VMEM right after the DMA (the X*M intermediate never touches HBM —
    the fusion win over the reference's two-conv emulation).
  * sum(M) rides the MXU too: per tap, an outer product of the
    (TH*W, G) mask slice with the per-group channel counts.
  * epilogue: y = (acc * winsize/max(msum,1) + b) where msum>0 else 0;
    new_mask = msum > 0.

Scope: stride 1, dilation 1, square kernels — every decoder layer +
head of the inpainting U-Net (the FLOP-dominant partial convs, and the
ones with G=2 grouped masks). Stride-2 encoder layers use XLA's native
strided conv, which is already MXU-optimal for plain convolution; the
wrapper in ops/partial_conv.py routes accordingly.

Training: ``partial_conv2d_pallas`` carries a custom VJP whose backward
is expressed in XLA (transposed conv for dx, patch-correlation for dW)
— masks are binary constants, so they get zero cotangents, matching the
reference's no-grad ones-conv.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _broadcast_groups(m, group_sizes):
    parts = [
        jnp.broadcast_to(m[..., g : g + 1], m.shape[:-1] + (s,))
        for g, s in enumerate(group_sizes)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _kernel(
    packed_hbm,  # (N, H_pad, W_pad8, Cpack) HBM: [x | mask | 0-pad] lanes
    w_ref,  # (k, k, Cpack, TC) VMEM (blocked over padded Cout); rows >= Cin+G are zero
    b_ref,  # (1, TC) VMEM
    sizes_ref,  # (G, 128) VMEM: per-group channel counts, lane-broadcast
    y_ref,  # out: (1, TH, W_out, TC) VMEM block
    mask_out_ref,  # out: (1, TH, W_out, 1) VMEM block
    buf0,  # scratch (R, W_pad8, Cpack): raw [x | m] rows, ping
    buf1,  # scratch (R, W_pad8, Cpack): raw [x | m] rows, pong
    xm_scr,  # scratch (R+1, W_pad8, Cpack): masked rows (+1 spare row), shared by all Cout tiles
    sems,  # DMA sems (2,)
    *,
    k: int,
    th: int,
    w_out: int,
    h_blocks: int,
    cin: int,
    group_sizes: Tuple[int, ...],
    winsize: float,
    use_bias: bool,
    acc_dtype,
):
    nh = pl.program_id(0)
    c = pl.program_id(1)
    r = th + k - 1
    g = len(group_sizes)
    cpack = buf0.shape[-1]

    def dma_for(step, buf_ref):
        n = step // h_blocks
        h = step % h_blocks
        return pltpu.make_async_copy(
            packed_hbm.at[n, pl.ds(h * th, r)], buf_ref, sems.at[step % 2]
        )

    def _prep(buf_ref):
        rows = buf_ref[:]
        m_rows = rows[..., cin : cin + g]
        # full-lane multiplier: group masks over x lanes, m over its own
        # lanes (m*m = m for binary masks), zeros over the padding tail
        mult = jnp.concatenate(
            [
                _broadcast_groups(m_rows, group_sizes),
                m_rows,
                jnp.zeros(rows.shape[:-1] + (cpack - cin - g,), rows.dtype),
            ],
            axis=-1,
        )
        # xm_scr has one spare row: the flattened-tap slices of the LAST
        # tap read up to k-1 elements past r*W_pad (garbage columns only)
        xm_scr[0:rows.shape[0]] = rows * mult

    # Double-buffered row streaming: wait for this block's rows, kick off
    # the NEXT block's DMA into the other buffer, then build the masked
    # rows once per block (the Cout grid axis iterates fastest and reuses
    # xm_scr). DMA destinations are whole scratch refs and sources slice
    # only untiled leading dims — both Mosaic-legal.
    @pl.when(jnp.logical_and(nh == 0, c == 0))
    def _warmup():
        dma_for(0, buf0).start()

    @pl.when(c == 0)
    def _pipeline():
        nh_total = pl.num_programs(0)

        @pl.when(nh % 2 == 0)
        def _even():
            dma_for(nh, buf0).wait()

            @pl.when(nh + 1 < nh_total)
            def _():
                dma_for(nh + 1, buf1).start()

            _prep(buf0)

        @pl.when(nh % 2 == 1)
        def _odd():
            dma_for(nh, buf1).wait()

            @pl.when(nh + 1 < nh_total)
            def _():
                dma_for(nh + 1, buf0).start()

            _prep(buf1)

    # Flattened-tap implicit GEMM: treating the padded rows as ONE flat
    # pixel axis makes every tap a contiguous sublane slice at offset
    # dkh*W_pad + dkw (a strided 2-D slice + reshape would gather-copy
    # the whole block per tap). The k-1 wrap-around columns per row are
    # garbage and get cropped at the store — (k-1)/W extra compute.
    w_pad8 = xm_scr.shape[1]
    pw_flat = th * w_pad8
    xm_flat = xm_scr[:].reshape((r + 1) * w_pad8, cpack)
    m_flat = xm_flat[:, cin : cin + g]  # mask lanes hold m (m*m = m, binary)
    sizes_mat = sizes_ref[:].astype(acc_dtype)  # (G, 128)

    acc = jnp.zeros((pw_flat, w_ref.shape[-1]), acc_dtype)
    msum = jnp.zeros((pw_flat, 128), acc_dtype)
    for dkh in range(k):
        for dkw in range(k):
            off = dkh * w_pad8 + dkw
            acc += jnp.dot(
                xm_flat[off : off + pw_flat], w_ref[dkh, dkw],
                preferred_element_type=acc_dtype,
            )
            msum += jnp.dot(
                m_flat[off : off + pw_flat].astype(acc_dtype), sizes_mat,
                preferred_element_type=acc_dtype,
            )

    msum1 = msum[:, 0:1]
    valid = msum1 > 0
    out = acc * (winsize / jnp.maximum(msum1, 1.0))
    if use_bias:
        out = out + b_ref[0][None, :].astype(acc_dtype)
    out = jnp.where(valid, out, jnp.zeros((), acc_dtype))
    y_ref[0] = out.reshape(th, w_pad8, -1)[:, :w_out].astype(y_ref.dtype)
    mask_out_ref[0] = valid.reshape(th, w_pad8, 1)[:, :w_out].astype(mask_out_ref.dtype)


def _pallas_forward(x, mask, kernel, bias, group_sizes, padding, interpret):
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    assert kh == kw, "square kernels only"
    k = kh
    ph, pw = padding
    h_out = h + 2 * ph - k + 1
    w_out = w + 2 * pw - k + 1
    g = mask.shape[-1]
    winsize = float(k * k * cin)

    w_pad8 = _round_up(w + 2 * pw, 8)
    c_pack = _round_up(cin + g, 128)
    itemsize = x.dtype.itemsize

    # pad Cout to full MXU lanes (zero weights, sliced off after the call)
    cout_p = cout if cout < 32 else _round_up(cout, 128)
    tc = min(128, cout_p)
    c_blocks = cout_p // tc

    # adaptive row-block height under a ~10MB VMEM budget
    th = min(8, h_out)
    for cand in (32, 16, 8):
        if h_out % cand or cand > h_out:
            continue
        r_c = cand + k - 1
        est = (
            3 * r_c * w_pad8 * c_pack * itemsize  # ping/pong bufs + xm scratch
            + cand * w_out * 128 * 4  # msum accumulator
            + 2 * cand * w_out * tc * 4  # acc + epilogue
            + k * k * c_pack * tc * itemsize  # weight tile
            + cand * w_out * (tc + 1) * itemsize  # out blocks
        )
        if est <= 10 * 1024 * 1024:
            th = cand
            break
    r = th + k - 1
    h_blocks = h_out // th

    # pack [x | mask | 0] with Mosaic-aligned W (8) and lane (128) dims
    packed = jnp.zeros((n, h + 2 * ph, w_pad8, c_pack), x.dtype)
    packed = packed.at[:, ph : ph + h, pw : pw + w, :cin].set(x)
    packed = packed.at[:, ph : ph + h, pw : pw + w, cin : cin + g].set(
        mask.astype(x.dtype)
    )

    w_aug = jnp.zeros((k, k, c_pack, cout_p), x.dtype)
    w_aug = w_aug.at[:, :, :cin, :cout].set(kernel.astype(x.dtype))
    bias_arr = jnp.zeros((1, cout_p), x.dtype)
    if bias is not None:
        bias_arr = bias_arr.at[0, :cout].set(bias.astype(x.dtype))
    sizes_mat = jnp.broadcast_to(
        jnp.asarray(group_sizes, jnp.float32).reshape(g, 1), (g, 128)
    )

    acc_dtype = jnp.float32
    kern = functools.partial(
        _kernel,
        k=k,
        th=th,
        w_out=w_out,
        h_blocks=h_blocks,
        cin=cin,
        group_sizes=tuple(group_sizes),
        winsize=winsize,
        use_bias=bias is not None,
        acc_dtype=acc_dtype,
    )

    flops = 2 * n * h_out * w_out * cout_p * c_pack * k * k
    y, new_mask = pl.pallas_call(
        kern,
        grid=(n * h_blocks, c_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (k, k, c_pack, tc), lambda nh, c: (0, 0, 0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tc), lambda nh, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, w_out, tc),
                lambda nh, c, hb=h_blocks: (nh // hb, nh % hb, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, w_out, 1),
                lambda nh, c, hb=h_blocks: (nh // hb, nh % hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h_out, w_out, cout_p), x.dtype),
            jax.ShapeDtypeStruct((n, h_out, w_out, 1), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, w_pad8, c_pack), x.dtype),
            pltpu.VMEM((r, w_pad8, c_pack), x.dtype),
            pltpu.VMEM((r + 1, w_pad8, c_pack), x.dtype),  # +1 spare row (flat-tap overrun)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                n * (h + 2 * ph) * w_pad8 * c_pack * itemsize * r // max(th, 1)
                + k * k * c_pack * cout_p * itemsize * c_blocks
                + h_out * w_out * cout_p * n * itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, w_aug, bias_arr, sizes_mat)
    if cout_p != cout:
        y = y[..., :cout]
    return y, new_mask


def _kernel_small_cout(
    packed_hbm,  # (N, H_pad, W_pad8, Cpack) HBM
    wstack_ref,  # (k*k*8, Cpack) VMEM: per tap t, rows [8t,8t+cout) = W_t^T,
    #              row 8t+cout = group sizes at the mask lanes; rest zero
    b_ref,  # (8, 128) VMEM: bias per output channel, lane-broadcast
    y_ref,  # out block: (1, 1, Cout, TH*W_pad8)  (channels-on-sublanes, flat pixels)
    mask_out_ref,  # out block: (1, 1, 1, TH*W_pad8)
    buf0,
    buf1,
    xm_t,  # scratch (Cpack, LANES_T): transposed masked rows
    sems,
    *,
    k: int,
    th: int,
    w_out: int,
    h_blocks: int,
    cin: int,
    group_sizes: Tuple[int, ...],
    winsize: float,
    cout: int,
    acc_dtype,
):
    """Transposed-output path for tiny Cout (the U-Net RGB head).

    A (pixels, 3)-shaped conv output wastes 125/128 of every MXU tile
    and vreg. Flipping the layout — channels on sublanes, the flattened
    pixel axis on lanes — restores full lane occupancy: ONE matmul of
    the (k*k*8, Cpack) tap-stacked weights against the transposed rows
    computes every tap's contribution (including the mask window sums,
    which ride along as a dedicated weight row), and taps combine with
    k^2 cheap lane-shifted adds.
    """
    nh = pl.program_id(0)
    r = th + k - 1
    g = len(group_sizes)
    cpack = buf0.shape[-1]
    w_pad8 = buf0.shape[1]
    pw_flat = th * w_pad8
    lanes_t = xm_t.shape[-1]

    def dma_for(step, buf_ref):
        n = step // h_blocks
        h = step % h_blocks
        return pltpu.make_async_copy(
            packed_hbm.at[n, pl.ds(h * th, r)], buf_ref, sems.at[step % 2]
        )

    def _prep(buf_ref):
        rows = buf_ref[:]
        m_rows = rows[..., cin : cin + g]
        mult = jnp.concatenate(
            [
                _broadcast_groups(m_rows, group_sizes),
                m_rows,
                jnp.zeros(rows.shape[:-1] + (cpack - cin - g,), rows.dtype),
            ],
            axis=-1,
        )
        flat = (rows * mult).reshape(r * w_pad8, cpack)
        flat_t = flat.T  # (Cpack, r*W_pad8) — TPU transpose unit
        xm_t[:] = jnp.pad(flat_t, ((0, 0), (0, lanes_t - r * w_pad8)))

    @pl.when(nh == 0)
    def _warmup():
        dma_for(0, buf0).start()

    nh_total = pl.num_programs(0)

    @pl.when(nh % 2 == 0)
    def _even():
        dma_for(nh, buf0).wait()

        @pl.when(nh + 1 < nh_total)
        def _():
            dma_for(nh + 1, buf1).start()

        _prep(buf0)

    @pl.when(nh % 2 == 1)
    def _odd():
        dma_for(nh, buf1).wait()

        @pl.when(nh + 1 < nh_total)
        def _():
            dma_for(nh + 1, buf0).start()

        _prep(buf1)

    # one matmul: all taps' outputs AND mask sums at full lane occupancy
    prod = jnp.dot(wstack_ref[:], xm_t[:], preferred_element_type=acc_dtype)

    acc = jnp.zeros((8, pw_flat), acc_dtype)
    t = 0
    for dkh in range(k):
        for dkw in range(k):
            off = dkh * w_pad8 + dkw
            acc += prod[8 * t : 8 * t + 8, off : off + pw_flat]
            t += 1

    msum = acc[cout : cout + 1]  # (1, PW)
    valid = msum > 0
    out = acc * (winsize / jnp.maximum(msum, 1.0))
    out = out + b_ref[:, 0:1].astype(acc_dtype)
    out = jnp.where(valid, out, jnp.zeros((), acc_dtype))
    # store flat (channels-on-sublanes); the NHWC fix-up happens host-side
    y_ref[0, 0] = out[:cout].astype(y_ref.dtype)
    mask_out_ref[0, 0] = valid.astype(mask_out_ref.dtype)


def _pallas_forward_small_cout(x, mask, kernel, bias, group_sizes, padding, interpret):
    n, h, w, cin = x.shape
    k, _, _, cout = kernel.shape
    ph, pw = padding
    h_out = h + 2 * ph - k + 1
    w_out = w + 2 * pw - k + 1
    g = mask.shape[-1]
    winsize = float(k * k * cin)
    w_pad8 = _round_up(w + 2 * pw, 8)
    c_pack = _round_up(cin + g, 128)
    itemsize = x.dtype.itemsize

    th = min(8, h_out)
    for cand in (32, 16, 8):
        if h_out % cand or cand > h_out:
            continue
        r_c = cand + k - 1
        lanes_c = _round_up(r_c * w_pad8 + k - 1, 128)
        est = (
            2 * r_c * w_pad8 * c_pack * itemsize
            + c_pack * lanes_c * itemsize
            + (k * k * 8) * lanes_c * 4  # prod
            + 8 * cand * w_pad8 * 4  # acc
        )
        if est <= 11 * 1024 * 1024:
            th = cand
            break
    r = th + k - 1
    h_blocks = h_out // th
    lanes_t = _round_up(r * w_pad8 + k - 1, 128)

    packed = jnp.zeros((n, h + 2 * ph, w_pad8, c_pack), x.dtype)
    packed = packed.at[:, ph : ph + h, pw : pw + w, :cin].set(x)
    packed = packed.at[:, ph : ph + h, pw : pw + w, cin : cin + g].set(
        mask.astype(x.dtype)
    )

    wstack = jnp.zeros((k * k * 8, c_pack), x.dtype)
    t = 0
    for dkh in range(k):
        for dkw in range(k):
            wt = kernel[dkh, dkw].T.astype(x.dtype)  # (cout, cin)
            wstack = wstack.at[8 * t : 8 * t + cout, :cin].set(wt)
            wstack = wstack.at[8 * t + cout, cin : cin + g].set(
                jnp.asarray(group_sizes, x.dtype)
            )
            t += 1
    bias_arr = jnp.zeros((8, 128), x.dtype)
    if bias is not None:
        bias_arr = bias_arr.at[:cout].set(
            jnp.broadcast_to(bias.astype(x.dtype)[:, None], (cout, 128))
        )

    kern = functools.partial(
        _kernel_small_cout,
        k=k,
        th=th,
        w_out=w_out,
        h_blocks=h_blocks,
        cin=cin,
        group_sizes=tuple(group_sizes),
        winsize=winsize,
        cout=cout,
        acc_dtype=jnp.float32,
    )
    y_t, mask_t = pl.pallas_call(
        kern,
        grid=(n * h_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, cout, th * w_pad8),
                lambda nh, hb=h_blocks: (nh // hb, nh % hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, th * w_pad8),
                lambda nh, hb=h_blocks: (nh // hb, nh % hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h_blocks, cout, th * w_pad8), x.dtype),
            jax.ShapeDtypeStruct((n, h_blocks, 1, th * w_pad8), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, w_pad8, c_pack), x.dtype),
            pltpu.VMEM((r, w_pad8, c_pack), x.dtype),
            pltpu.VMEM((c_pack, lanes_t), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * w_pad8 * (k * k * 8) * c_pack,
            bytes_accessed=int(
                n * (h + 2 * ph) * w_pad8 * c_pack * itemsize * r // max(th, 1)
                + h_out * w_pad8 * (cout + 1) * n * itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, wstack, bias_arr)
    # back to NHWC + crop the flat-tap garbage columns (all XLA fix-ups)
    def unflatten(z, c):
        z = z.reshape(n, h_blocks, c, th, w_pad8)
        z = jnp.transpose(z, (0, 1, 3, 4, 2))  # (N, HB, TH, W_pad8, C)
        return z.reshape(n, h_out, w_pad8, c)[:, :, :w_out]

    return unflatten(y_t, cout), unflatten(mask_t, 1)


def _supported(stride, dilation, kernel_shape, h_out):
    kh, kw, _, _ = kernel_shape
    return (
        stride == (1, 1)
        and dilation == (1, 1)
        and kh == kw
        and (h_out % min(8, h_out) == 0)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def partial_conv2d_pallas(
    x,
    mask,
    kernel,
    bias,
    group_sizes: Tuple[int, ...] = None,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    interpret: bool | None = None,
):
    """Fused partial conv (see module docstring). Falls back to the XLA
    implementation for configurations outside the kernel's scope
    (stride/dilation != 1)."""
    y, new_mask = _forward_impl(
        x, mask, kernel, bias, group_sizes, stride, padding, dilation, interpret
    )
    return y, new_mask


def _forward_impl(x, mask, kernel, bias, group_sizes, stride, padding, dilation, interpret):
    from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
        _partial_conv2d_xla,
    )

    kh = kernel.shape[0]
    h_out = (x.shape[1] + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    if group_sizes is None:
        group_sizes = (x.shape[-1],)
    if interpret is None:
        # compiled Mosaic only exists on TPU; interpret elsewhere. The
        # default *device* can differ from the default backend (tests pin
        # it to CPU while the TPU plugin stays registered) — honor it.
        default_dev = jax.config.jax_default_device
        interpret = jax.default_backend() != "tpu" or (
            default_dev is not None and getattr(default_dev, "platform", None) == "cpu"
        )
    if not _supported(stride, dilation, kernel.shape, h_out):
        return _partial_conv2d_xla(
            x, mask, kernel, bias, tuple(group_sizes), stride, padding, dilation
        )
    if kernel.shape[-1] <= 7:
        # tiny Cout (e.g. the RGB head): transposed-output kernel
        return _pallas_forward_small_cout(
            x, mask, kernel, bias, group_sizes, padding, interpret
        )
    return _pallas_forward(x, mask, kernel, bias, group_sizes, padding, interpret)


def _fwd(x, mask, kernel, bias, group_sizes, stride, padding, dilation, interpret):
    y, new_mask = _forward_impl(
        x, mask, kernel, bias, group_sizes, stride, padding, dilation, interpret
    )
    # residuals: msum-based scale is recomputed in backward (cheap, saves HBM)
    return (y, new_mask), (x, mask, kernel, bias)


def _bwd(group_sizes, stride, padding, dilation, interpret, res, cot):
    """XLA backward: grads flow through y = valid*(scale*conv(x*m, W) + b).

    dacc = g * scale * valid
    dx   = conv_transpose(dacc, W) * broadcast(m)
    dW   = correlate(x*m, dacc);  db = sum(g * valid)
    mask is binary (non-differentiable) -> zero cotangent, matching the
    reference's no-grad ones-conv.
    """
    from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
        apply_mask,
        mask_window_sum,
    )

    x, mask, kernel, bias = res
    g_y, _g_mask = cot  # cotangent wrt new_mask ignored (binary)
    kh, kw, cin, cout = kernel.shape
    gs = group_sizes if group_sizes is not None else (cin,)
    msum = mask_window_sum(
        mask, gs, (kh, kw), stride=stride, padding=padding, dilation=dilation
    )
    winsize = float(kh * kw * cin)
    valid = msum > 0
    scale = jnp.where(valid, winsize / jnp.maximum(msum, 1.0), 0.0)
    dacc = (g_y.astype(jnp.float32) * scale).astype(x.dtype)

    mask_t = mask.astype(x.dtype)
    xm = apply_mask(x, mask_t, gs)

    # rows/cols the forward's floor-division ignored contribute no grad
    keff = (dilation[0] * (kh - 1) + 1, dilation[1] * (kw - 1) + 1)
    rem = (
        (x.shape[1] + 2 * padding[0] - keff[0]) % stride[0],
        (x.shape[2] + 2 * padding[1] - keff[1]) % stride[1],
    )

    # dx: transposed conv of dacc with the flipped kernel
    dxm = lax.conv_general_dilated(
        dacc,
        jnp.flip(kernel, (0, 1)).swapaxes(2, 3).astype(x.dtype),
        window_strides=(1, 1),
        padding=(
            (keff[0] - 1 - padding[0], keff[0] - 1 - padding[0] + rem[0]),
            (keff[1] - 1 - padding[1], keff[1] - 1 - padding[1] + rem[1]),
        ),
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dx = apply_mask(dxm, mask_t, gs)

    # dW: correlation of xm with dacc (channels as batch, spatial as kernel)
    dw = (
        lax.conv_general_dilated(
            xm.transpose(3, 1, 2, 0),  # (Cin, H, W, N) as NHWC
            dacc.transpose(1, 2, 0, 3),  # (H', W', N, Cout) as HWIO
            window_strides=dilation,
            padding=(
                (padding[0], padding[0] - rem[0]),
                (padding[1], padding[1] - rem[1]),
            ),
            rhs_dilation=stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        .transpose(1, 2, 0, 3)
        .astype(kernel.dtype)
    )

    db = None
    if bias is not None:
        db = jnp.sum(g_y.astype(jnp.float32) * valid, axis=(0, 1, 2)).astype(bias.dtype)
    return dx, jnp.zeros_like(mask), dw, db


partial_conv2d_pallas.defvjp(_fwd, _bwd)
