"""Spectral-norm + self-attention experiment track.

The reference's README-era experiment notes mention spectral-norm and
self-attention trials alongside the Xception/ASPP encoder experiments
(SURVEY.md section 2.1 "possible extras" [R-low]; the reference mount is
empty, so these are rebuilt from the era's standard formulations):

- :class:`SpectralNormConv2d` — conv whose kernel is divided by its
  largest singular value, estimated with the classic one-step power
  iteration (Miyato et al. 2018), bit-matching
  ``torch.nn.utils.spectral_norm`` semantics: ``u``/``v`` vectors are
  persistent state, updated only in training forwards, and the weight
  matrix is the (Cout, Cin*kh*kw) flattening.
- :class:`SelfAttention2d` — SAGAN-style non-local block (Zhang et al.
  2018): 1x1 query/key/value projections, key/value max-pooled 2x,
  softmax attention over positions, 1x1 output projection, zero-init
  learnable ``gamma`` residual gate (the block starts as identity).

TPU notes: the attention einsums are plain (positions x positions)
GEMMs that tile onto the MXU; at the U-Net bottleneck (<= 32^2
positions at 512^2 input) they are tiny. The power iteration is two
matvecs per step — negligible. Everything is shape-static under jit.

Parity: both blocks are mirrored operator-for-operator by
``tests/oracle/torch_ref.py`` (``SNConv2d`` / ``SelfAttention2d``) and
tolerance-tested at identical weights in ``tests/test_experiments.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from text_segmentation_image_inpainting_tpu.ops.conv import conv2d, torch_same_padding

_EPS = 1e-12  # torch.nn.utils.spectral_norm default


def _l2_normalize(x, eps=_EPS):
    # torch F.normalize: x / max(||x||, eps)
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def spectral_sigma(weight_mat: jnp.ndarray, u: jnp.ndarray, *, n_iter: int = 1):
    """One-or-more power-iteration steps on ``weight_mat`` (Cout, K).

    Returns ``(sigma, u_new, v_new)`` exactly as torch's
    ``SpectralNorm.compute_weight`` does with ``n_power_iterations=n_iter``:
    v = normalize(W^T u); u = normalize(W v); sigma = u^T W v.

    Gradient semantics also match torch: the iteration runs on a
    *detached* W (torch's ``with torch.no_grad()`` block; u/v are
    buffers), and only the final bilinear form sees the differentiable
    W — so ``d sigma / dW == u v^T``, not the power-iteration chain rule.
    """
    if n_iter < 1:
        raise ValueError(f"spectral_sigma needs n_iter >= 1, got {n_iter}")
    w32 = weight_mat.astype(jnp.float32)
    w_iter = jax.lax.stop_gradient(w32)
    u = jax.lax.stop_gradient(u.astype(jnp.float32))
    for _ in range(n_iter):
        v = _l2_normalize(w_iter.T @ u)
        u = _l2_normalize(w_iter @ v)
    sigma = u @ (w32 @ v)
    return sigma, u, v


class SpectralNormConv2d(nn.Module):
    """Conv2d with spectral-normalized kernel (torch-geometry padding).

    ``u``/``v`` live in the ``'spectral'`` variable collection (persistent
    power-iteration state, analogous to BN's ``batch_stats``); they update
    only when ``update_stats=True`` (training forwards). The kernel param
    is stored un-normalized, exactly like torch's ``weight_orig``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    n_power_iterations: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, update_stats: bool = False):
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k, k, cin, self.features), jnp.float32
        )
        # torch flattens (Cout, Cin, kh, kw) -> (Cout, Cin*kh*kw); our HWIO
        # kernel transposes to OIHW first so u/v match torch's exactly
        wmat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)
        u = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(
                nn.initializers.normal(1.0)(self.make_rng("params"), (self.features,))
            ),
        )
        v = self.variable(
            "spectral", "v", lambda: jnp.zeros((wmat.shape[1],), jnp.float32)
        )
        if self.is_initializing():
            # torch draws u random-normal at construction; the paired v is
            # derived on the first forward — store the post-warm-up pair so
            # eval-from-init is well defined (v starts as zeros otherwise)
            _, u0, v0 = spectral_sigma(wmat, u.value, n_iter=1)
            u.value, v.value = u0, v0
        if (
            update_stats
            and self.n_power_iterations > 0  # torch n_power_iterations=0:
            # training forwards use the STORED u/v, same as eval
            and not self.is_initializing()
        ):
            sigma, u_new, v_new = spectral_sigma(
                wmat, u.value, n_iter=self.n_power_iterations
            )
            u.value, v.value = u_new, v_new
        else:
            # eval: torch uses the STORED u,v with no iteration
            sigma = u.value.astype(jnp.float32) @ (
                wmat.astype(jnp.float32) @ v.value.astype(jnp.float32)
            )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        kn = (kernel / sigma).astype(self.dtype)
        return conv2d(
            x.astype(self.dtype),
            kn,
            stride=self.stride,
            padding=torch_same_padding(k, self.dilation),
            dilation=self.dilation,
            bias=None if bias is None else bias.astype(self.dtype),
        )


class SelfAttention2d(nn.Module):
    """SAGAN self-attention over spatial positions (N,H,W,C) -> (N,H,W,C).

    query = 1x1(C -> C//8); key = 1x1(C -> C//8) + maxpool2;
    value = 1x1(C -> C//2) + maxpool2; attn = softmax(q k^T);
    out = 1x1(attn v, C//2 -> C); y = x + gamma * out, gamma init 0.
    All projections are bias-free (SAGAN convention); ``spectral_norm=
    True`` wraps them in :class:`SpectralNormConv2d` (the paper applies
    SN to all generator weights).
    """

    spectral_norm: bool = False
    dtype: Any = jnp.float32

    def _proj(self, feats, name):
        if self.spectral_norm:
            return SpectralNormConv2d(
                feats, 1, use_bias=False, dtype=self.dtype, name=name
            )
        return nn.Conv(
            feats, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )

    @nn.compact
    def __call__(self, x, *, update_stats: bool = False):
        n, h, w, c = x.shape
        kw = {"update_stats": update_stats} if self.spectral_norm else {}
        q = self._proj(c // 8, "query")(x, **kw)
        k = self._proj(c // 8, "key")(x, **kw)
        v = self._proj(c // 2, "value")(x, **kw)
        # torch MaxPool2d(2): floor division, window 2, stride 2
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))  # noqa: E731
        k, v = pool(k), pool(v)
        q = q.reshape(n, h * w, c // 8)
        k = k.reshape(n, -1, c // 8)
        v = v.reshape(n, -1, c // 2)
        # (positions x positions) GEMMs -> MXU; accumulate fp32
        logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c // 2)
        o = self._proj(c, "out")(o, **kw)
        gamma = self.param("gamma", nn.initializers.zeros_init(), (), jnp.float32)
        return x + gamma.astype(x.dtype) * o
