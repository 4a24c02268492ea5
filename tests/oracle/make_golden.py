"""Regenerate the committed golden op fixtures from the torch oracle.

    python -m tests.oracle.make_golden

Writes tests/fixtures/golden_ops.npz: inputs + oracle outputs for the
partial-conv / resize / dilation ops, so op parity is checkable without
torch installed (and guards against torch version drift).
"""

from __future__ import annotations

import os

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracle.torch_ref import PartialConv2d

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_ops.npz")


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def main():
    rng = np.random.default_rng(2026)
    torch.manual_seed(2026)
    data = {}

    # partial conv: k3 s1 grouped masks
    x = rng.standard_normal((2, 16, 16, 10)).astype(np.float32)
    m = (rng.random((2, 16, 16, 2)) > 0.4).astype(np.float32)
    ref = PartialConv2d(10, 6, 3, padding=1)
    m_full = np.concatenate([np.repeat(m[..., :1], 4, -1), np.repeat(m[..., 1:], 6, -1)], -1)
    y, nm = ref(nchw(x), nchw(m_full))
    data.update(
        pc3_x=x, pc3_m=m,
        pc3_w=np.moveaxis(ref.conv.weight.detach().numpy(), (0, 1, 2, 3), (3, 2, 0, 1)),
        pc3_b=ref.conv.bias.detach().numpy(),
        pc3_y=nhwc(y), pc3_nm=nhwc(nm)[..., :1],
    )

    # partial conv: k7 s2 single mask, no bias
    x2 = rng.standard_normal((1, 18, 18, 5)).astype(np.float32)
    m2 = (rng.random((1, 18, 18, 1)) > 0.5).astype(np.float32)
    ref2 = PartialConv2d(5, 4, 7, stride=2, padding=3, bias=False)
    y2, nm2 = ref2(nchw(x2), nchw(m2))
    data.update(
        pc7_x=x2, pc7_m=m2,
        pc7_w=np.moveaxis(ref2.conv.weight.detach().numpy(), (0, 1, 2, 3), (3, 2, 0, 1)),
        pc7_y=nhwc(y2), pc7_nm=nhwc(nm2),
    )

    # bilinear resize up + down (half-pixel, no antialias)
    r = rng.standard_normal((1, 9, 13, 3)).astype(np.float32)
    data.update(
        rs_x=r,
        rs_up=nhwc(F.interpolate(nchw(r), size=(18, 26), mode="bilinear", align_corners=False)),
        rs_dn=nhwc(F.interpolate(nchw(r), size=(5, 7), mode="bilinear", align_corners=False)),
        rs_ac=nhwc(F.interpolate(nchw(r), size=(18, 26), mode="bilinear", align_corners=True)),
    )

    # square dilation radius 2
    dm = (rng.random((1, 16, 16, 1)) > 0.9).astype(np.float32)
    data.update(
        di_m=dm,
        di_out=nhwc(F.max_pool2d(nchw(dm), kernel_size=5, stride=1, padding=2)),
    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
