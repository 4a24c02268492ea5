"""Partial convolution (Liu et al. 2018, arXiv:1804.07723) — functional op.

Semantics (paper eq. 1-2): for each output window,

    y = W^T (X . M) * sum(1) / sum(M) + b     if sum(M) > 0
    y = 0                                      otherwise
    M' = 1[sum(M) > 0]

The reference repo emulates this with TWO stock ``nn.Conv2d`` calls — a
trainable feature conv over ``X*M`` plus a frozen all-ones conv computing
``sum(M)`` per window (SURVEY.md C5). Here the canonical implementation
is a single fused Pallas TPU kernel (``ops/pallas/partial_conv_kernel.py``)
that does masked conv, ``1/sum(M)`` renormalization and binary mask update
in one pass; the XLA implementation below is the always-correct fallback
and the autodiff path.

Mask representation (TPU-first design choice): masks are carried as
(N, H, W, G) with ``G`` *mask groups*, each group covering a contiguous
block of feature channels of static size ``group_sizes[g]``. The common
case is G=1 (one mask broadcast over all channels — exactly the
reference's hole mask). The U-Net decoder's skip concatenation produces
G=2 (decoder-stream mask + encoder-skip mask). This is mathematically
identical to the paper's per-channel masks whenever channels within a
group share a mask (always true here), but moves O(C) mask bandwidth down
to O(G).

With grouped masks the window normalizer is

    sum(M) = sum_g group_sizes[g] * window_sum(M_g)
    sum(1) = kh * kw * sum_g group_sizes[g] = kh * kw * Cin

computed by ONE tiny conv of the G-channel mask with a per-group-weighted
ones kernel.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from text_segmentation_image_inpainting_tpu.ops.conv import IntOrPair, _pair

# --- spatial (H-sharded) execution context -------------------------------
#
# ``spatial_axis("data")`` is a TRACE-TIME switch: while active, every
# ``partial_conv2d`` call assumes it is tracing inside a ``shard_map``
# whose inputs are H-sharded over the named mesh axis, exchanges k//2-row
# halos with ``lax.ppermute`` (ICI neighbor traffic) and convolves with
# VALID H padding — ring-end zeros reproduce the global zero pad exactly,
# so sharded output bit-matches the unsharded op. This lets the
# *unmodified* ``InpaintUNet.apply`` run H-sharded (parallel/spatial.py).

_spatial_ctx = threading.local()


@contextlib.contextmanager
def spatial_axis(axis_name: str):
    prev = getattr(_spatial_ctx, "axis", None)
    _spatial_ctx.axis = axis_name
    try:
        yield
    finally:
        _spatial_ctx.axis = prev


def _active_spatial_axis():
    return getattr(_spatial_ctx, "axis", None)


def _halo_exchange_rows(x: jax.Array, above: int, below: int, axis_name: str) -> jax.Array:
    """Concat ``above`` rows from the upper H-neighbor and ``below`` rows
    from the lower one: (N,Hl,W,C) -> (N, above+Hl+below, W, C). Ring ends
    receive zeros (= the global zero padding)."""
    n_dev = lax.axis_size(axis_name)
    down_perm = [(i, i + 1) for i in range(n_dev - 1)]
    up_perm = [(i + 1, i) for i in range(n_dev - 1)]
    parts = []
    if above > 0:
        parts.append(lax.ppermute(x[:, -above:], axis_name, down_perm))
    parts.append(x)
    if below > 0:
        parts.append(lax.ppermute(x[:, :below], axis_name, up_perm))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def mask_window_sum(
    mask: jax.Array,
    group_sizes: Sequence[int],
    kernel_size: Tuple[int, int],
    *,
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """sum(M) per output window, weighted by channel-group sizes.

    mask: (N, H, W, G) in {0, 1}. Returns (N, H', W', 1) float32.
    """
    kh, kw = kernel_size
    g = mask.shape[-1]
    assert len(group_sizes) == g, (group_sizes, mask.shape)
    w = jnp.ones((kh, kw, g, 1), jnp.float32) * jnp.asarray(
        group_sizes, jnp.float32
    ).reshape(1, 1, g, 1)
    return lax.conv_general_dilated(
        mask.astype(jnp.float32),
        w,
        window_strides=stride,
        padding=(
            (padding[0], padding[0]),
            (padding[1], padding[1]),
        ),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def broadcast_mask(mask: jax.Array, group_sizes: Sequence[int]) -> jax.Array:
    """Expand (N,H,W,G) grouped mask to per-channel (N,H,W,sum(group_sizes))."""
    parts = [
        jnp.broadcast_to(mask[..., g : g + 1], mask.shape[:-1] + (size,))
        for g, size in enumerate(group_sizes)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def apply_mask(x: jax.Array, mask: jax.Array, group_sizes: Sequence[int]) -> jax.Array:
    """x * broadcast_mask(mask) without materializing the broadcast.

    Each channel-group slice multiplies its own 1-channel mask — XLA
    fuses the rank-broadcast into the multiply, where an explicit
    ``broadcast_to``+concat writes a full feature-map-sized mask to HBM
    first (measured ~14 ms/batch of pure broadcast traffic at 512^2).
    """
    if len(group_sizes) == 1:
        return x * mask
    parts = []
    off = 0
    for gi, size in enumerate(group_sizes):
        parts.append(x[..., off : off + size] * mask[..., gi : gi + 1])
        off += size
    return jnp.concatenate(parts, axis=-1)


def _s2d_stride2_kernel(kernel: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
    """(k, k, Cin, Cout) odd-k kernel -> ((kb, kb, 4*Cin, Cout), (pad_lo, pad_hi))
    such that a stride-2 pad-k//2 conv equals a stride-1 conv of the
    space-to-depth(2) input with the returned kernel and padding.

    Output pixel i covers input rows 2i-p .. 2i+(k-1-p) (p = k//2), i.e.
    blocks i-ceil(p/2) .. i+floor((k-1-p)/2); block offset bo at in-block
    row dy corresponds to tap d = 2*bo + dy, weight kernel[d+p] (zero
    when |d| out of range).
    """
    k, _, cin, cout = kernel.shape
    assert k % 2 == 1
    p = k // 2
    pad_lo = -(-p // 2)
    pad_hi = (k - 1 - p) // 2
    kb = pad_lo + pad_hi + 1

    sel = np.zeros((kb, 2, k), np.float32)
    for b in range(kb):
        for i in (0, 1):
            d = 2 * (b - pad_lo) + i
            if -p <= d <= k - 1 - p:
                sel[b, i, d + p] = 1.0
    selj = jnp.asarray(sel, kernel.dtype)
    out = jnp.einsum("aiu,bjv,uvco->abijco", selj, selj, kernel)
    return out.reshape(kb, kb, 4 * cin, cout), (pad_lo, pad_hi)


def partial_conv2d_s2d(
    x: jax.Array,
    mask: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    input_s2d: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Stride-2, pad-k//2 partial conv computed on the space-to-depth(2)
    form of the input — numerically identical to
    ``partial_conv2d(x, mask, kernel, bias, stride=2, padding=k//2)``
    for a single mask group.

    The U-Net stem (7x7 stride-2 over 3 channels at 512^2) lowers badly
    as a direct conv (Cin=3, ~3 ms/batch profiled); on the S2D layout it
    becomes a 4x4 stride-1 conv over 12 channels at 256^2 — an
    MXU-shaped implicit GEMM.
    """
    kh, kw, cin, _ = kernel.shape
    assert kh == kw and kh % 2 == 1
    dt = x.dtype
    w_s2d, (pl, ph) = _s2d_stride2_kernel(kernel.astype(dt))
    ones_s2d, _ = _s2d_stride2_kernel(jnp.ones((kh, kw, 1, 1), jnp.float32))
    conv = lambda lhs, rhs: lax.conv_general_dilated(  # noqa: E731
        lhs, rhs, window_strides=(1, 1), padding=[(pl, ph), (pl, ph)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    acc = jnp.float32 if dt in (jnp.bfloat16, jnp.float16) else dt
    if input_s2d:
        # x: (N, H/2, W/2, 4*Cin) s2d form, mask: (N, H/2, W/2, 4) s2d
        masked = s2d_apply_mask(x, mask)
        m_s2d = mask.astype(jnp.float32)
    else:
        assert mask.shape[-1] == 1, "s2d path covers the G=1 stem only"
        masked = space_to_depth(x * mask.astype(dt))
        m_s2d = space_to_depth(mask.astype(jnp.float32))
    feat = conv(masked, w_s2d).astype(acc)
    msum = float(cin) * conv(m_s2d, ones_s2d)
    return _pconv_epilogue(feat, msum, bias, float(kh * kw * cin), dt)


def partial_conv2d(
    x: jax.Array,
    mask: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    group_sizes: Sequence[int] | None = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    impl: str = "xla",
    input_s2d: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused partial convolution.

    Args:
      x: (N, H, W, Cin) features.
      mask: (N, H, W, G) binary validity mask (1 = valid pixel).
      kernel: (kh, kw, Cin, Cout) HWIO.
      bias: optional (Cout,). NOT renormalized; zeroed in fully-masked
        windows (paper semantics; matches the reference two-conv emulation
        which subtracts/re-adds the bias around the renorm).
      group_sizes: channel count covered by each mask group; defaults to
        a single group covering all Cin channels.
      impl: 'xla' (two lax convs + fused epilogue) or 'pallas' (fused
        single-pass TPU kernel).

    Returns:
      (y, new_mask): y (N, H', W', Cout); new_mask (N, H', W', 1) in
      x.dtype, 1 where the window saw any valid pixel.
    """
    kh, kw, cin, _ = kernel.shape
    if group_sizes is None:
        group_sizes = (cin,)
    assert sum(group_sizes) == cin, (group_sizes, kernel.shape)
    assert mask.shape[-1] == (4 if input_s2d else len(group_sizes))
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)

    ax = _active_spatial_axis()
    if ax is not None:
        # H-sharded execution (tracing inside shard_map): exchange halo
        # rows, then convolve with VALID H padding. halo_above = p; the
        # bottom needs p-(s-1) rows (last local output row y=Hl/s-1 reads
        # up to s*y - p + d*(k-1) = Hl-1 + p-(s-1)). Ring-end zeros from
        # ppermute == the global zero pad, for features AND mask alike.
        assert impl == "xla", f"spatial mode supports impl='xla' only, got {impl!r}"
        assert p[0] == d[0] * (kh - 1) // 2, (
            f"spatial mode requires torch-same H padding, got p={p[0]} for "
            f"k={kh}, dilation={d[0]}"
        )
        assert x.shape[1] % s[0] == 0, (x.shape, s)
        above = p[0]
        below = p[0] - (s[0] - 1)
        assert below >= 0, (p, s)
        x = _halo_exchange_rows(x, above, below, ax)
        mask = _halo_exchange_rows(mask, above, below, ax)
        p = (0, p[1])

    if impl == "s2d":
        assert s == (2, 2) and p == (kh // 2, kw // 2) and d == (1, 1)
        assert len(group_sizes) == 1
        return partial_conv2d_s2d(x, mask, kernel, bias, input_s2d=input_s2d)

    if impl == "pallas":
        from text_segmentation_image_inpainting_tpu.ops.pallas.partial_conv_kernel import (
            partial_conv2d_pallas,
        )

        # positional: custom_vjp nondiff args cannot be passed by keyword
        return partial_conv2d_pallas(
            x, mask.astype(x.dtype), kernel, bias, tuple(group_sizes), s, p, d
        )

    return _partial_conv2d_xla(x, mask, kernel, bias, tuple(group_sizes), s, p, d)


def _pconv_epilogue(feat, msum, bias, window_size, out_dtype):
    """Shared renorm/bias/zero epilogue: feat (acc dtype), msum f32."""
    acc_dtype = feat.dtype
    valid = msum > 0
    scale = window_size / jnp.maximum(msum, 1.0)
    out = feat * scale.astype(acc_dtype)
    if bias is not None:
        out = out + bias.astype(acc_dtype)
    # cast BEFORE the where: otherwise XLA sinks the f32->bf16 convert past
    # downstream upsamples/multiplies, doubling their HBM traffic (profiled)
    out = jnp.where(valid, out.astype(out_dtype), jnp.zeros((), out_dtype))
    return out, valid.astype(out_dtype)


# per-dimension phase selector for the nearest-up2 decomposition:
# _UP2_SEL[p, a, u] = 1 iff full-res tap u contributes to phase p at
# window position a (phase 0 window rows {Y-1, Y}: W[0] | W[1]+W[2];
# phase 1 window rows {Y, Y+1}: W[0]+W[1] | W[2])
_UP2_SEL = np.array(
    [[[1, 0, 0], [0, 1, 1]], [[1, 1, 0], [0, 0, 1]]], np.float32
)

# per-dimension selector for the full-res-conv-on-s2d decomposition:
# _S2D_SEL[p, a, i, u] = 1 iff original tap u = d+1 with
# d = 2*(a-1+p) + i - p in {-1,0,1} (in-block offset i, window pos a)
_S2D_SEL = np.zeros((2, 2, 2, 3), np.float32)
for _p in (0, 1):
    for _a in (0, 1):
        for _i in (0, 1):
            _d = 2 * (_a - 1 + _p) + _i - _p
            if -1 <= _d <= 1:
                _S2D_SEL[_p, _a, _i, _d + 1] = 1.0


def _up2_phase_kernel(kernel: jax.Array) -> jax.Array:
    """3x3 kernel -> (2, 2, Cin, 4*Cout) phase kernel bank such that

        conv3x3(upsample_nearest(g, 2), kernel, pad=1)
          == interleave of the 4 phase outputs of
             conv2x2(g, phase_kernel, pad=1)

    Derivation: output row y = 2Y+py reads up(g)[y+dy] = g[(y+dy)//2],
    so phase py=0 sees rows {Y-1: W[0], Y: W[1]+W[2]} and phase py=1
    sees {Y: W[0]+W[1], Y+1: W[2]} (same along x). One einsum against
    the constant per-dim selector — a single fused contraction, not an
    on-device soup of tiny slices/concats (profiled at ~0.6 ms/level).
    """
    _, _, cin, cout = kernel.shape
    sel = jnp.asarray(_UP2_SEL, kernel.dtype)
    out = jnp.einsum("pau,qbv,uvco->abcpqo", sel, sel, kernel)
    return out.reshape(2, 2, cin, 4 * cout)


def _interleave_phases(phased: jax.Array, cout: int) -> jax.Array:
    """(N, Hh+1, Wh+1, 4*Cout) padded phase-conv output -> (N, 2Hh, 2Wh, Cout).

    Phase (py, px) output at (Y, X) lives at padded index (Y+py, X+px)
    (pad-1 conv2x2 windows cover {i-1, i}).
    """
    n, hp, wp, _ = phased.shape
    hh, wh = hp - 1, wp - 1
    rows = []
    for py in (0, 1):
        cols = []
        for px in (0, 1):
            ph = 2 * py + px
            cols.append(
                phased[:, py : py + hh, px : px + wh, ph * cout : (ph + 1) * cout]
            )
        rows.append(jnp.stack(cols, axis=3))  # (N, Hh, Wh, 2, C)
    out = jnp.stack(rows, axis=2)  # (N, Hh, 2, Wh, 2, C)
    return out.reshape(n, 2 * hh, 2 * wh, cout)


def space_to_depth(x: jax.Array, factor: int = 2) -> jax.Array:
    """(N, H, W, C) -> (N, H/f, W/f, f*f*C); channel order (dy, dx, c)."""
    n, h, w, c = x.shape
    f = factor
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // f, w // f, f * f * c)


def depth_to_space(x: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    n, hh, wh, cf = x.shape
    f = factor
    c = cf // (f * f)
    x = x.reshape(n, hh, wh, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hh * f, wh * f, c)


def s2d_apply_mask(x_s2d: jax.Array, m_s2d: jax.Array) -> jax.Array:
    """Grouped multiply of an S2D feature map (N,Hh,Wh,4C) by its S2D
    mask (N,Hh,Wh,4): equals ``space_to_depth(x * m)``."""
    n, hh, wh, cf = x_s2d.shape
    c = cf // 4
    out = x_s2d.reshape(n, hh, wh, 4, c) * m_s2d[..., None].astype(x_s2d.dtype)
    return out.reshape(n, hh, wh, cf)


def _s2d_phase_kernel(kernel: jax.Array) -> jax.Array:
    """3x3 kernel -> (2, 2, 4*Cin, 4*Cout) operating on space-to-depth(2)
    input and producing the 4 output phases, such that

        conv3x3(z, kernel, pad=1)
          == interleave of conv2x2(space_to_depth(z, 2), this, pad=1)

    Derivation: with the pad-1 conv2x2 window at output index Y+py
    covering blocks {Y+py-1, Y+py}, window position b hits block offset
    bo = b-1+py, source row 2*bo+dy, i.e. tap d = 2*bo+dy-py; the entry
    is kernel[d+1] when d is in {-1,0,1}, else zero. (Same slicing
    convention as :func:`_up2_phase_kernel` so both banks share one
    conv.) Implemented as one einsum against the constant selector.
    """
    _, _, cin, cout = kernel.shape
    sel = jnp.asarray(_S2D_SEL, kernel.dtype)
    # (a, b, i, j, c, p, q, o): window pos, in-block offset, cin, phase, cout
    out = jnp.einsum("paiu,qbjv,uvco->abijcpqo", sel, sel, kernel)
    return out.reshape(2, 2, 4 * cin, 4 * cout)


def partial_conv2d_up2(
    f_lo: jax.Array,
    m_lo: jax.Array,
    skip_f: jax.Array,
    skip_m: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    skip_s2d: bool = False,
    out_s2d: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused ``upsample_nearest(2) -> concat skip -> 3x3 partial conv``.

    Numerically identical to::

        cat_f = concat([upsample_nearest(f_lo, 2), skip_f])
        cat_m = concat([upsample_nearest(m_lo, 2), skip_m])
        partial_conv2d(cat_f, cat_m, kernel, bias,
                       group_sizes=(C_lo, C_skip), padding=1)

    but everything runs at HALF resolution: since
    ``up2(f_lo) * up2(m_lo) == up2(f_lo * m_lo)`` (nearest replication),
    a 3x3 conv over a x2-replicated grid collapses to four 2x2 phase
    kernels; and a full-res 3x3 conv over the skip stream becomes a 2x2
    conv over its space-to-depth form producing the same 4 phases. Both
    banks and both mask window-counts share TWO convs total (features,
    counts), the renorm/bias/zero epilogue runs in phase space, and one
    interleave produces the full-res output. 4x better MXU occupancy,
    no full-res intermediates (the round-1 profile's top cost).

    Args:
      f_lo:   (N, H/2, W/2, C_lo) decoder stream (pre-upsample).
      m_lo:   (N, H/2, W/2, 1) its mask.
      skip_f: (N, H, W, C_skip) encoder skip features.
      skip_m: (N, H, W, 1) skip mask.
      kernel: (3, 3, C_lo + C_skip, Cout) — the SAME parameter the
        unfused path uses (checkpoint-compatible).
      bias:   optional (Cout,).
      skip_s2d: skip_f / skip_m are ALREADY in space-to-depth(2) form
        ((N, H/2, W/2, 4*C_skip) / (N, H/2, W/2, 4)) — lets the caller
        compute the S2D relayout once and share it across consumers.
      out_s2d: return (y, new_mask) in space-to-depth(2) form instead of
        full res — callers compositing in S2D space skip the (lane-poor
        at small Cout) full-res interleave entirely.

    Returns (y, new_mask) exactly like :func:`partial_conv2d`.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "phase decomposition is derived for 3x3"
    c_lo = f_lo.shape[-1]
    c_skip = skip_f.shape[-1] // (4 if skip_s2d else 1)
    assert c_lo + c_skip == cin, (f_lo.shape, skip_f.shape, kernel.shape)
    dt = f_lo.dtype
    conv = lambda lhs, rhs: lax.conv_general_dilated(  # noqa: E731
        lhs, rhs, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    acc = jnp.float32 if dt in (jnp.bfloat16, jnp.float16) else dt

    w_lo = kernel[:, :, :c_lo].astype(dt)
    w_skip = kernel[:, :, c_lo:].astype(dt)
    ones31 = jnp.ones((3, 3, 1, 1), jnp.float32)

    if skip_s2d:
        masked_skip = s2d_apply_mask(skip_f.astype(dt), skip_m)
        skip_m_s2d = skip_m.astype(dt)
    else:
        masked_skip = space_to_depth(skip_f * skip_m.astype(dt))
        skip_m_s2d = space_to_depth(skip_m.astype(dt))

    # ONE conv for both feature banks AND the group-weighted window
    # counts: input [masked f_lo | masked s2d skip | m_lo | s2d skip_m],
    # kernel block-diagonal (feature banks produce the 4*Cout phase
    # features; mask channels produce the 4 phase counts)
    feat_in = jnp.concatenate(
        [f_lo * m_lo.astype(dt), masked_skip, m_lo.astype(dt), skip_m_s2d], axis=-1
    )
    w_feat = jnp.concatenate(
        [_up2_phase_kernel(w_lo), _s2d_phase_kernel(w_skip)], axis=2
    )  # (2, 2, c_lo + 4*c_skip, 4*cout)
    # RAW per-bank tap counts (<= 9 per phase window) ride the same GEMM
    # in bf16 exactly; the c_lo/c_skip weighting happens in the f32
    # epilogue. Weighted bf16 counts (the old form) rounded at values
    # like 603 (64*9 + 3*9 at the RGB-skip head level) — a systematic
    # ~0.3% renorm error that broke the documented fused==unfused
    # identity (round-3 review finding).
    w_cnt_lo = _up2_phase_kernel(ones31)  # (2, 2, 1, 4)
    w_cnt_sk = _s2d_phase_kernel(ones31)  # (2, 2, 4, 4)
    w_ones = jnp.concatenate(
        [
            jnp.concatenate([w_cnt_lo, jnp.zeros((2, 2, 1, 4), jnp.float32)], axis=3),
            jnp.concatenate([jnp.zeros((2, 2, 4, 4), jnp.float32), w_cnt_sk], axis=3),
        ],
        axis=2,
    ).astype(dt)  # (2, 2, 1 + 4, 4 + 4)
    cf = c_lo + 4 * c_skip
    w_all = jnp.concatenate(
        [
            jnp.concatenate([w_feat, jnp.zeros((2, 2, cf, 8), dt)], axis=3),
            jnp.concatenate([jnp.zeros((2, 2, 5, 4 * cout), dt), w_ones], axis=3),
        ],
        axis=2,
    )  # (2, 2, cf + 5, 4*cout + 8)
    all_ph = conv(feat_in, w_all)
    feat_ph = all_ph[..., : 4 * cout]  # (N, Hh+1, Wh+1, 4*Cout)
    cnt = all_ph[..., 4 * cout :].astype(jnp.float32)  # (N, Hh+1, Wh+1, 8)
    msum_ph = float(c_lo) * cnt[..., :4] + float(c_skip) * cnt[..., 4:]

    # renorm/bias/zero epilogue in phase space (4x less traffic than at
    # full res, and only the final bf16 result is interleaved)
    n, hp, wp, _ = feat_ph.shape
    feat4 = feat_ph.astype(acc).reshape(n, hp, wp, 4, cout)
    msum4 = msum_ph.reshape(n, hp, wp, 4, 1)
    valid4 = msum4 > 0
    out4 = feat4 * (float(kh * kw * cin) / jnp.maximum(msum4, 1.0)).astype(acc)
    if bias is not None:
        out4 = out4 + bias.astype(acc)
    out4 = jnp.where(valid4, out4.astype(dt), jnp.zeros((), dt))
    if out_s2d:
        # phase (py,px) lives at padded spatial offset (py,px) and channel
        # block ph*cout:(ph+1)*cout. Slice SPATIALLY only (all channels)
        # and pick each phase's channel block with a constant 0/1 channel
        # mask + sum — small-channel slices (e.g. 3 of 12 at the RGB head)
        # lane-pad catastrophically on TPU, while the select-sum fuses
        # into one elementwise loop.
        hh, wh = hp - 1, wp - 1
        out_flat = out4.reshape(n, hp, wp, 4 * cout)
        valid_flat = valid4.astype(dt).reshape(n, hp, wp, 4)
        out = jnp.zeros((n, hh, wh, 4 * cout), dt)
        vout = jnp.zeros((n, hh, wh, 4), dt)
        ch = jnp.arange(4 * cout) // cout
        for py in (0, 1):
            for px in (0, 1):
                ph = 2 * py + px
                sel = (ch == ph).astype(dt)
                out = out + out_flat[:, py : py + hh, px : px + wh, :] * sel
                vsel = (jnp.arange(4) == ph).astype(dt)
                vout = vout + valid_flat[:, py : py + hh, px : px + wh, :] * vsel
        return out, vout
    out = _interleave_phases(out4.reshape(n, hp, wp, 4 * cout), cout)
    new_mask = _interleave_phases(valid4.astype(dt).reshape(n, hp, wp, 4), 1)
    return out, new_mask


def _partial_conv2d_xla(x, mask, kernel, bias, group_sizes, stride, padding, dilation):
    kh, kw, cin, _ = kernel.shape
    masked = apply_mask(x, mask.astype(x.dtype), group_sizes)
    acc_dtype = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype
    # NOTE: no preferred_element_type here — conv with a widened output
    # dtype is not transposable under autodiff (jax 0.9), and TPU bf16
    # convs accumulate in f32 natively anyway; the epilogue runs in f32.
    feat = lax.conv_general_dilated(
        masked,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(acc_dtype)
    msum = mask_window_sum(
        mask, group_sizes, (kh, kw), stride=stride, padding=padding, dilation=dilation
    )
    return _pconv_epilogue(feat, msum, bias, float(kh * kw * cin), x.dtype)
