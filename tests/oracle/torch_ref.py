"""Torch-CPU parity oracle.

A minimal, independent PyTorch implementation of the reference's
building blocks, written from the papers (Liu et al. 2018
arXiv:1804.07723; Sandler et al. 2018 arXiv:1801.04381) and SURVEY.md's
functional spec — NOT copied from the reference repo (whose mount is
empty; see SURVEY.md provenance note). Every JAX layer/model is
tolerance-tested against this oracle with identical weights
(SURVEY.md section 4, BASELINE.json:5 "per-layer output fidelity vs the
PyTorch CPU reference").

Layout is torch-native NCHW; tests transpose at the boundary.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class PartialConv2d(nn.Module):
    """Two-conv emulation of partial convolution (SURVEY.md C5).

    feat = conv(x * m); msum = ones_conv(m) (no grad);
    out  = feat * (winsize / msum) + b where msum > 0 else 0;
    m'   = 1[msum > 0].

    ``mask`` may be (N, 1, H, W) (broadcast over channels) or per-channel
    (N, Cin, H, W); the window normalizer always counts all Cin channels
    (winsize = kh*kw*Cin), per the paper's multi-channel formulation.
    """

    def __init__(self, cin, cout, kernel_size, stride=1, padding=0, dilation=1, bias=True):
        super().__init__()
        self.conv = nn.Conv2d(
            cin, cout, kernel_size, stride=stride, padding=padding, dilation=dilation, bias=bias
        )
        kh, kw = self.conv.kernel_size
        self.register_buffer("ones_kernel", torch.ones(1, cin, kh, kw), persistent=False)
        self.window_size = float(cin * kh * kw)

    def forward(self, x, mask):
        if mask.shape[1] == 1 and x.shape[1] != 1:
            mask = mask.expand_as(x)
        masked = x * mask
        feat = F.conv2d(
            masked,
            self.conv.weight,
            None,
            stride=self.conv.stride,
            padding=self.conv.padding,
            dilation=self.conv.dilation,
        )
        with torch.no_grad():
            msum = F.conv2d(
                mask,
                self.ones_kernel,
                None,
                stride=self.conv.stride,
                padding=self.conv.padding,
                dilation=self.conv.dilation,
            )
            valid = msum > 0
        out = feat * (self.window_size / msum.clamp(min=1.0))
        if self.conv.bias is not None:
            out = out + self.conv.bias.view(1, -1, 1, 1)
        out = torch.where(valid, out, torch.zeros((), dtype=out.dtype))
        return out, valid.to(x.dtype)


def conv_bn_act(cin, cout, k, stride=1, dilation=1, groups=1, act="relu6"):
    pad = dilation * (k - 1) // 2
    layers = [
        nn.Conv2d(cin, cout, k, stride, pad, dilation=dilation, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
    ]
    if act == "relu6":
        layers.append(nn.ReLU6(inplace=False))
    elif act == "relu":
        layers.append(nn.ReLU(inplace=False))
    elif act == "leaky":
        layers.append(nn.LeakyReLU(0.2, inplace=False))
    return nn.Sequential(*layers)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand -> depthwise -> project)."""

    def __init__(self, cin, cout, stride, expand_ratio, dilation=1):
        super().__init__()
        hidden = int(round(cin * expand_ratio))
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand_ratio != 1:
            layers.append(conv_bn_act(cin, hidden, 1))
        layers.append(conv_bn_act(hidden, hidden, 3, stride=stride, dilation=dilation, groups=hidden))
        layers.append(nn.Conv2d(hidden, cout, 1, bias=False))
        layers.append(nn.BatchNorm2d(cout))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


# (t, c, n, s): expansion, out channels, repeats, first-block stride
MOBILENETV2_CONFIG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def round_ch(c, width_mult, divisor=8):
    c = c * width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class MobileNetV2Encoder(nn.Module):
    """Dilated MobileNetV2 backbone for dense prediction.

    Stages past ``output_stride`` swap stride for dilation (SURVEY.md C3).
    Feature taps at strides 2 (stem), 4 and the final dilated stage.
    """

    def __init__(self, width_mult=1.0, output_stride=8):
        super().__init__()
        self.stem = conv_bn_act(3, round_ch(32, width_mult), 3, stride=2)
        cin = round_ch(32, width_mult)
        current_stride = 2
        dilation = 1
        blocks = []
        self.tap_idx = {}
        for t, c, n, s in MOBILENETV2_CONFIG:
            cout = round_ch(c, width_mult)
            for i in range(n):
                want_stride = s if i == 0 else 1
                d, stride = dilation, want_stride
                if want_stride > 1:
                    if current_stride >= output_stride:
                        stride = 1
                        dilation *= want_stride
                        d = dilation // want_stride  # dilation of THIS block
                    else:
                        current_stride *= want_stride
                blocks.append(InvertedResidual(cin, cout, stride, t, dilation=d))
                cin = cout
            if c == 24:
                self.tap_idx["s4"] = len(blocks) - 1
        self.blocks = nn.ModuleList(blocks)
        self.out_channels = cin

    def forward(self, x):
        taps = {}
        x = self.stem(x)
        taps["s2"] = x
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i == self.tap_idx["s4"]:
                taps["s4"] = x
        taps["out"] = x
        return taps


class DilatedDecoder(nn.Module):
    """Dilated-conv decoder + bilinear upsample + skip concat (SURVEY.md C4)."""

    def __init__(self, c_out_enc, c_s4, c_s2, mid=128):
        super().__init__()
        self.aspp = nn.ModuleList(
            [conv_bn_act(c_out_enc, mid, 3, dilation=d, act="leaky") for d in (1, 2, 4)]
        )
        self.fuse = conv_bn_act(3 * mid, mid, 1, act="leaky")
        self.skip4 = conv_bn_act(c_s4, 48, 1, act="leaky")
        self.dec4 = conv_bn_act(mid + 48, mid // 2, 3, act="leaky")
        self.skip2 = conv_bn_act(c_s2, 24, 1, act="leaky")
        self.dec2 = conv_bn_act(mid // 2 + 24, mid // 4, 3, act="leaky")
        self.head = nn.Conv2d(mid // 4, 1, 1)

    @staticmethod
    def _up(x, ref):
        return F.interpolate(x, size=ref.shape[-2:], mode="bilinear", align_corners=False)

    def forward(self, taps):
        x = torch.cat([m(taps["out"]) for m in self.aspp], dim=1)
        x = self.fuse(x)
        x = self._up(x, taps["s4"])
        x = self.dec4(torch.cat([x, self.skip4(taps["s4"])], dim=1))
        x = self._up(x, taps["s2"])
        x = self.dec2(torch.cat([x, self.skip2(taps["s2"])], dim=1))
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        return self.head(x)


class TextSegmenter(nn.Module):
    def __init__(self, width_mult=1.0, output_stride=8):
        super().__init__()
        self.encoder = MobileNetV2Encoder(width_mult, output_stride)
        self.decoder = DilatedDecoder(
            self.encoder.out_channels, round_ch(24, width_mult), round_ch(32, width_mult)
        )

    def forward(self, x):
        return self.decoder(self.encoder(x))


class InpaintUNet(nn.Module):
    """Partial-conv U-Net (Liu et al. 2018 fig. 2 / SURVEY.md C6).

    Encoder: stride-2 partial convs (7/5/5/3... kernels, 64->512 ch),
    ReLU, BN except layer 1. Decoder: nearest-up x2 of feature AND mask,
    concat skip feature + skip mask, 3x3 partial conv, BN, LeakyReLU(0.2).
    Final layer concatenates the raw input (image + mask) and maps to RGB
    with bias, no BN/activation.
    """

    ENC = [  # (cout, k, bn)
        (64, 7, False),
        (128, 5, True),
        (256, 5, True),
        (512, 3, True),
        (512, 3, True),
        (512, 3, True),
        (512, 3, True),
        (512, 3, True),
    ]

    def __init__(self, depth=8, cin=3):
        super().__init__()
        assert 3 <= depth <= 8
        self.depth = depth
        self.enc_convs = nn.ModuleList()
        self.enc_bns = nn.ModuleList()
        self.enc_channels = []
        c = cin
        for cout, k, bn in self.ENC[:depth]:
            self.enc_convs.append(PartialConv2d(c, cout, k, stride=2, padding=k // 2, bias=not bn))
            self.enc_bns.append(nn.BatchNorm2d(cout) if bn else nn.Identity())
            self.enc_channels.append(cout)
            c = cout
        self.dec_convs = nn.ModuleList()
        self.dec_bns = nn.ModuleList()
        for lvl in range(depth - 1, 0, -1):
            skip_c = self.enc_channels[lvl - 1]
            self.dec_convs.append(PartialConv2d(c + skip_c, skip_c, 3, padding=1, bias=False))
            self.dec_bns.append(nn.BatchNorm2d(skip_c))
            c = skip_c
        self.head = PartialConv2d(c + cin, 3, 3, padding=1, bias=True)

    def forward(self, x, mask):
        # x: (N,3,H,W) holes zeroed; mask: (N,1,H,W), 1 = valid
        skips = [(x, mask)]
        f, m = x, mask
        for conv, bn in zip(self.enc_convs, self.enc_bns):
            f, m = conv(f, m)
            f = F.relu(bn(f))
            skips.append((f, m))
        for i, (conv, bn) in enumerate(zip(self.dec_convs, self.dec_bns)):
            lvl = self.depth - 1 - i
            sf, sm = skips[lvl]
            f = F.interpolate(f, scale_factor=2, mode="nearest")
            m = F.interpolate(m, scale_factor=2, mode="nearest")
            cat_f = torch.cat([f, sf], dim=1)
            cat_m = torch.cat([m.expand_as(f), sm.expand_as(sf)], dim=1)
            f, m = conv(cat_f, cat_m)
            f = F.leaky_relu(bn(f), 0.2)
        sf, sm = skips[0]
        f = F.interpolate(f, scale_factor=2, mode="nearest")
        m = F.interpolate(m, scale_factor=2, mode="nearest")
        f = torch.cat([f, sf], dim=1)
        m = torch.cat([m.expand(-1, f.shape[1] - sf.shape[1], -1, -1), sm.expand_as(sf)], dim=1)
        out, _ = self.head(f, m)
        return out


class VGG16Features(nn.Module):
    """torchvision-layout VGG16 ``features`` trunk, taps after pool1/2/3.

    Written from the VGG config (Simonyan & Zisserman 2014); layer
    numbering matches torchvision so ImageNet state_dicts drop in.
    """

    CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]

    def __init__(self):
        super().__init__()
        layers = []
        c = 3
        for v in self.CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c, v, 3, padding=1), nn.ReLU(inplace=False)]
                c = v
        self.features = nn.Sequential(*layers)
        self.tap_idx = [4, 9, 16]  # after pool1, pool2, pool3

    def forward(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.tap_idx:
                taps.append(x)
        return taps
