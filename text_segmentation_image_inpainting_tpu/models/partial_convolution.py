"""Partial-convolution layer + inpainting U-Net (Liu et al. 2018).

TPU-native rebuild of the reference's ``models/partial_convolution.py``
(SURVEY.md C5/C6). The layer forwards to
``ops.partial_conv2d`` — XLA fallback or the fused Pallas kernel
(``impl='pallas'``) that does masked conv, 1/sum(M) renorm and binary
mask update in one pass (BASELINE.json:5).

Masks ride alongside features as (N, H, W, G) *grouped* masks
(see ops/partial_conv.py): G=1 everywhere except right after the
decoder's skip concat, where G=2 (decoder stream + encoder skip) — an
exact, bandwidth-cheap encoding of the paper's per-channel masks.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
    partial_conv2d,
    partial_conv2d_up2,
)
from text_segmentation_image_inpainting_tpu.ops.resize import upsample_nearest


class PartialConv(nn.Module):
    """Partial 2-D convolution: (features, mask) -> (features', mask')."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None  # default: torch-style k//2
    dilation: int = 1
    use_bias: bool = True
    impl: str = "xla"  # 'xla' | 'pallas'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, group_sizes: Sequence[int] | None = None,
                 input_s2d: bool = False):
        cin = x.shape[-1] // (4 if input_s2d else 1)
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2 if self.padding is None else self.padding
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),  # kaiming, matching reference init
            (k, k, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        return partial_conv2d(
            x,
            mask.astype(x.dtype),
            kernel.astype(self.dtype),
            bias.astype(self.dtype) if bias is not None else None,
            group_sizes=group_sizes,
            stride=self.stride,
            padding=pad,
            dilation=self.dilation,
            impl=self.impl,
            input_s2d=input_s2d,
        )


class PartialConvUp2(nn.Module):
    """Fused ``upsample_nearest(2) + skip concat + 3x3 partial conv``.

    Parameter names and shapes are IDENTICAL to a ``PartialConv`` over
    the concatenated streams (kernel (3,3,C_lo+C_skip,Cout)), so the two
    are checkpoint-interchangeable; the compute path is the half-res
    phase decomposition in :func:`ops.partial_conv.partial_conv2d_up2`.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f_lo, m_lo, skip_f, skip_m, *, skip_s2d: bool = False,
                 out_s2d: bool = False):
        cin = f_lo.shape[-1] + skip_f.shape[-1] // (4 if skip_s2d else 1)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, cin, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        f_lo = f_lo.astype(self.dtype)
        return partial_conv2d_up2(
            f_lo,
            m_lo.astype(self.dtype),
            skip_f.astype(self.dtype),
            skip_m.astype(self.dtype),
            kernel.astype(self.dtype),
            bias.astype(self.dtype) if bias is not None else None,
            skip_s2d=skip_s2d,
            out_s2d=out_s2d,
        )


class InpaintUNet(nn.Module):
    """Partial-conv U-Net inpainting generator (SURVEY.md C6).

    Encoder: stride-2 partial convs (kernels 7/5/5/3..., channels
    64->512), ReLU, BatchNorm except the first layer. Decoder: nearest
    x2 upsample of feature AND mask, concat skip feature + skip mask,
    3x3 partial conv, BatchNorm, LeakyReLU(0.2). Final layer
    concatenates the raw (image, mask) input and maps to RGB with bias,
    no norm/activation.

    ``depth`` (default 8) fits 512x512 inputs (bottleneck 2x2); reduce
    for smaller test shapes. Input spatial size must be divisible by
    2**depth.
    """

    depth: int = 8
    impl: str = "xla"
    # SAGAN self-attention block at the encoder bottleneck — the
    # reference's README-era self-attention experiment (SURVEY.md
    # section 2.1 extras [R-low]); ``attention_sn`` additionally
    # spectral-normalizes the block's projections. Off by default: the
    # reference's shipped model is pure partial-conv.
    attention: bool = False
    attention_sn: bool = False
    # decoder levels run the fused half-res phase conv (PartialConvUp2,
    # checkpoint-identical params; ~2x faster at 512^2). False restores
    # the literal upsample->concat->conv composition.
    fuse_up: bool = True
    # only fuse levels whose full-res output is at least this large: the
    # phase decomposition wins on big spatial dims, while at <=64^2 the
    # 4x-inflated phase weights make the conv weight-streaming-bound
    fuse_min_hw: int = 128
    dtype: Any = jnp.float32

    ENC: Tuple[Tuple[int, int, bool], ...] = (
        (64, 7, False),
        (128, 5, True),
        (256, 5, True),
        (512, 3, True),
        (512, 3, True),
        (512, 3, True),
        (512, 3, True),
        (512, 3, True),
    )

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False, freeze_enc_bn: bool = False,
                 io_s2d: bool = False):
        """``freeze_enc_bn=True`` runs *encoder* BatchNorms in
        running-average mode while decoder BNs keep training — the Liu
        et al. phase-2 fine-tune (SURVEY.md C11: only encoder BN is
        frozen; decoder BN continues updating).

        ``io_s2d=True`` (requires the fused xla path): ``x`` and ``mask``
        are given in space-to-depth(2) form ((N,H/2,W/2,12) / (N,H/2,W/2,4))
        and the output is returned in s2d form as well — the serving
        pipeline composites in s2d space and pays for exactly ONE
        full-res 3-channel relayout (lane-poor on TPU) instead of four.
        """
        assert 3 <= self.depth <= 8
        fused = self.fuse_up and self.impl == "xla"
        assert not (io_s2d and not fused), "io_s2d requires the fused xla path"
        sp = tuple(d * (2 if io_s2d else 1) for d in x.shape[1:3])
        assert sp[0] % (1 << self.depth) == 0 and sp[1] % (1 << self.depth) == 0, (
            f"spatial dims {sp} must be divisible by 2**depth={1 << self.depth}"
        )
        bn = lambda name, frozen=False: nn.BatchNorm(  # noqa: E731
            use_running_average=(not train) or frozen, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )

        skips = [(x, mask)]
        f, m = x, mask
        for i, (cout, k, use_bn) in enumerate(self.ENC[: self.depth]):
            # the 3-channel stem lowers badly as a direct stride-2 conv;
            # route it through the space-to-depth form (exact, see
            # ops.partial_conv.partial_conv2d_s2d)
            impl = "s2d" if (i == 0 and fused) else self.impl
            f, m = PartialConv(
                cout, k, stride=2, use_bias=not use_bn, impl=impl,
                dtype=self.dtype, name=f"enc{i}",
            )(f, m, input_s2d=io_s2d and i == 0)
            if use_bn:
                f = bn(f"enc{i}_bn", frozen=freeze_enc_bn)(f)
            f = nn.relu(f)
            skips.append((f, m))

        if self.attention:
            from text_segmentation_image_inpainting_tpu.models.experiments import (
                SelfAttention2d,
            )

            # attention sees features only; the mask stream is untouched
            # (positions are (H/2^depth)^2 — tiny GEMMs at 512^2 input)
            f = SelfAttention2d(
                spectral_norm=self.attention_sn, dtype=self.dtype, name="attn"
            )(f, update_stats=train if self.attention_sn else False)

        for lvl in range(self.depth - 1, 0, -1):
            sf, sm = skips[lvl]
            if fused and sf.shape[1] >= self.fuse_min_hw:
                f, m = PartialConvUp2(
                    sf.shape[-1], use_bias=False, dtype=self.dtype, name=f"dec{lvl}"
                )(f, m, sf, sm)
            else:
                f = upsample_nearest(f, 2)
                m = upsample_nearest(m, 2)
                cat_f = jnp.concatenate([f, sf], axis=-1)
                cat_m = jnp.concatenate([m, sm], axis=-1)
                f, m = PartialConv(
                    sf.shape[-1], 3, use_bias=False, impl=self.impl,
                    dtype=self.dtype, name=f"dec{lvl}",
                )(cat_f, cat_m, group_sizes=(f.shape[-1], sf.shape[-1]))
            f = nn.leaky_relu(bn(f"dec{lvl}_bn")(f), 0.2)

        sf, sm = skips[0]
        if fused and (io_s2d or sf.shape[1] >= self.fuse_min_hw):
            out, _ = PartialConvUp2(
                3, use_bias=True, dtype=self.dtype, name="head"
            )(f, m, sf, sm, skip_s2d=io_s2d, out_s2d=io_s2d)
        else:
            f = upsample_nearest(f, 2)
            m = upsample_nearest(m, 2)
            cat_f = jnp.concatenate([f, sf], axis=-1)
            cat_m = jnp.concatenate([m, sm], axis=-1)
            out, _ = PartialConv(
                3, 3, use_bias=True, impl=self.impl, dtype=self.dtype, name="head"
            )(cat_f, cat_m, group_sizes=(f.shape[-1], sf.shape[-1]))
        return out

    @staticmethod
    def compose(out, gt, mask):
        """I_comp = M*I_gt + (1-M)*I_out (paper's composed image)."""
        return mask * gt + (1.0 - mask) * out
