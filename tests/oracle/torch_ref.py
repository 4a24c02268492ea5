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


class XSeparableConv(nn.Module):
    """Xception separable conv: depthwise 3x3 + pointwise 1x1, each conv-bn-relu."""

    def __init__(self, cin, cout, stride=1, dilation=1):
        super().__init__()
        self.dw = conv_bn_act(cin, cin, 3, stride=stride, dilation=dilation,
                              groups=cin, act="relu")
        self.pw = conv_bn_act(cin, cout, 1, act="relu")

    def forward(self, x):
        return self.pw(self.dw(x))


class XceptionBlock(nn.Module):
    """N separable convs (stride on the last) + residual/projected skip."""

    def __init__(self, cin, feats, stride=1, dilation=1):
        super().__init__()
        seps = []
        c = cin
        for i, f in enumerate(feats):
            s = stride if i == len(feats) - 1 else 1
            seps.append(XSeparableConv(c, f, stride=s, dilation=dilation))
            c = f
        self.seps = nn.ModuleList(seps)
        self.skip = (
            None if stride == 1 and cin == feats[-1]
            else conv_bn_act(cin, feats[-1], 1, stride=stride, act="none")
        )

    def forward(self, x):
        h = x
        for m in self.seps:
            h = m(h)
        return (x if self.skip is None else self.skip(x)) + h


XCEPTION_ENTRY = ((128, 128, 128), (256, 256, 256), (728, 728, 728))
XCEPTION_EXIT = (728, 1024, 1024)
XCEPTION_EXIT_SEPS = (1536, 2048)


def _xception_stride_plan(output_stride, n_strided):
    plan = []
    current, dilation = 2, 1
    for _ in range(n_strided):
        if current >= output_stride:
            plan.append((1, dilation))
            dilation *= 2
        else:
            plan.append((2, dilation))
            current *= 2
    return plan


class XceptionEncoder(nn.Module):
    """Aligned-Xception-style dilated backbone (alternative-encoder track,
    SURVEY.md section 2.1 extras [R-low]); taps s2/s4/out like the
    MobileNetV2 encoder."""

    def __init__(self, width_mult=1.0, output_stride=8, middle_repeats=8):
        super().__init__()
        wm = width_mult
        self.stem1 = conv_bn_act(3, round_ch(32, wm), 3, stride=2, act="relu")
        self.stem2 = conv_bn_act(round_ch(32, wm), round_ch(64, wm), 3, act="relu")
        plan = _xception_stride_plan(output_stride, len(XCEPTION_ENTRY) + 1)
        entries = []
        cin = round_ch(64, wm)
        for bi, chans in enumerate(XCEPTION_ENTRY):
            stride, d = plan[bi]
            feats = [round_ch(c, wm) for c in chans]
            entries.append(XceptionBlock(cin, feats, stride=stride, dilation=d))
            cin = feats[-1]
        self.entry = nn.ModuleList(entries)
        mid_d = plan[len(XCEPTION_ENTRY) - 1][1] * (
            2 if plan[len(XCEPTION_ENTRY) - 1][0] == 1 else 1
        )
        mid_c = round_ch(XCEPTION_ENTRY[-1][-1], wm)
        self.mid = nn.ModuleList(
            [XceptionBlock(mid_c, [mid_c] * 3, dilation=mid_d)
             for _ in range(middle_repeats)]
        )
        stride, d = plan[len(XCEPTION_ENTRY)]
        feats = [round_ch(c, wm) for c in XCEPTION_EXIT]
        self.exit0 = XceptionBlock(cin, feats, stride=stride, dilation=d)
        exit_d = d * (2 if stride == 1 else 1)
        cin = feats[-1]
        exits = []
        for c in XCEPTION_EXIT_SEPS:
            exits.append(XSeparableConv(cin, round_ch(c, wm), dilation=exit_d))
            cin = round_ch(c, wm)
        self.exit1, self.exit2 = exits
        self.out_channels = cin

    def forward(self, x):
        taps = {}
        x = self.stem2(self.stem1(x))
        taps["s2"] = x
        for bi, b in enumerate(self.entry):
            x = b(x)
            if bi == 0:
                taps["s4"] = x
        for b in self.mid:
            x = b(x)
        x = self.exit2(self.exit1(self.exit0(x)))
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
    def __init__(self, width_mult=1.0, output_stride=8, backbone="mobilenet_v2"):
        super().__init__()
        if backbone == "xception":
            self.encoder = XceptionEncoder(width_mult, output_stride)
            c_s4, c_s2 = round_ch(128, width_mult), round_ch(64, width_mult)
        else:
            self.encoder = MobileNetV2Encoder(width_mult, output_stride)
            c_s4, c_s2 = round_ch(24, width_mult), round_ch(32, width_mult)
        self.decoder = DilatedDecoder(self.encoder.out_channels, c_s4, c_s2)

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


class SNConv2d(nn.Module):
    """torch.nn.utils.spectral_norm over a stock Conv2d (Miyato et al.
    2018) — oracle for models/experiments.py::SpectralNormConv2d."""

    def __init__(self, cin, cout, k, stride=1, dilation=1, bias=True):
        super().__init__()
        self.conv = nn.utils.spectral_norm(
            nn.Conv2d(
                cin, cout, k, stride=stride, padding=dilation * (k - 1) // 2,
                dilation=dilation, bias=bias,
            )
        )

    def forward(self, x):
        return self.conv(x)


class SelfAttention2d(nn.Module):
    """SAGAN self-attention block (Zhang et al. 2018) — oracle for
    models/experiments.py::SelfAttention2d. Key/value max-pooled 2x,
    zero-init gamma residual gate."""

    def __init__(self, channels, spectral_norm=False):
        super().__init__()
        sn = nn.utils.spectral_norm if spectral_norm else (lambda m: m)
        self.query = sn(nn.Conv2d(channels, channels // 8, 1, bias=False))
        self.key = sn(nn.Conv2d(channels, channels // 8, 1, bias=False))
        self.value = sn(nn.Conv2d(channels, channels // 2, 1, bias=False))
        self.out = sn(nn.Conv2d(channels // 2, channels, 1, bias=False))
        self.gamma = nn.Parameter(torch.zeros(()))

    def forward(self, x):
        n, c, h, w = x.shape
        q = self.query(x).reshape(n, c // 8, h * w)
        k = F.max_pool2d(self.key(x), 2).reshape(n, c // 8, -1)
        v = F.max_pool2d(self.value(x), 2).reshape(n, c // 2, -1)
        attn = torch.softmax(torch.einsum("ncq,nck->nqk", q, k), dim=-1)
        o = torch.einsum("nqk,nck->ncq", attn, v).reshape(n, c // 2, h, w)
        return x + self.gamma * self.out(o)
