"""Test-only torch models mirroring the reference architecture's state_dict
naming, used to golden-test checkpoint conversion and full-model parity.

Written fresh for the test suite (table-driven, not a copy of
/root/reference/model.py); what matters is that parameter NAMES and semantics
match the released checkpoints' layout so the converter is exercised exactly
as it would be on real ViNet_*.pt files.
"""

from __future__ import annotations

import torch
from torch import nn

MIXED_PLAN = {
    "3b": (192, 64, 96, 128, 16, 32, 32),
    "3c": (256, 128, 128, 192, 32, 96, 64),
    "4b": (480, 192, 96, 208, 16, 48, 64),
    "4c": (512, 160, 112, 224, 24, 64, 64),
    "4d": (512, 128, 128, 256, 24, 64, 64),
    "4e": (512, 112, 144, 288, 32, 64, 64),
    "4f": (528, 256, 160, 320, 32, 128, 128),
    "5b": (832, 256, 160, 320, 32, 128, 128),
    "5c": (832, 384, 192, 384, 48, 128, 128),
}


class TBasic(nn.Module):
    def __init__(self, i, o, k, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv3d(i, o, k, s, p, bias=False)
        self.bn = nn.BatchNorm3d(o, eps=1e-3, momentum=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TSep(nn.Module):
    def __init__(self, i, o, k, s=1, p=0):
        super().__init__()
        self.conv_s = nn.Conv3d(i, o, (1, k, k), (1, s, s), (0, p, p), bias=False)
        self.bn_s = nn.BatchNorm3d(o, eps=1e-3, momentum=0.001)
        self.conv_t = nn.Conv3d(o, o, (k, 1, 1), (s, 1, 1), (p, 0, 0), bias=False)
        self.bn_t = nn.BatchNorm3d(o, eps=1e-3, momentum=0.001)

    def forward(self, x):
        x = torch.relu(self.bn_s(self.conv_s(x)))
        return torch.relu(self.bn_t(self.conv_t(x)))


class TMixed(nn.Module):
    def __init__(self, name):
        super().__init__()
        i, b0, b1r, b1, b2r, b2, b3 = MIXED_PLAN[name]
        self.branch0 = nn.Sequential(TBasic(i, b0, 1))
        self.branch1 = nn.Sequential(TBasic(i, b1r, 1), TSep(b1r, b1, 3, 1, 1))
        self.branch2 = nn.Sequential(TBasic(i, b2r, 1), TSep(b2r, b2, 3, 1, 1))
        self.branch3 = nn.Sequential(nn.MaxPool3d(3, 1, 1), TBasic(i, b3, 1))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1)


class TBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.base1 = nn.Sequential(
            TSep(3, 64, 7, 2, 3),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            TBasic(64, 64, 1),
            TSep(64, 192, 3, 1, 1),
        )
        self.maxp2 = nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.base2 = nn.Sequential(TMixed("3b"), TMixed("3c"))
        self.maxp3 = nn.MaxPool3d(3, 2, 1)
        self.base3 = nn.Sequential(*[TMixed(n) for n in ("4b", "4c", "4d", "4e", "4f")])
        self.maxt4 = nn.MaxPool3d((2, 1, 1), (2, 1, 1))
        self.maxp4 = nn.MaxPool3d((1, 2, 2), (1, 2, 2))
        self.base4 = nn.Sequential(TMixed("5b"), TMixed("5c"))

    def forward(self, x):
        y3 = self.base1(x)
        y2 = self.base2(self.maxp2(y3))
        y1 = self.base3(self.maxp3(y2))
        y0 = self.base4(self.maxp4(self.maxt4(y1)))
        return y0, y1, y2, y3


class TDecoder32(nn.Module):
    """clip-32, 3-hier decoder plan with the reference's convtspN Sequential
    naming (incl. the time-axis skip concats)."""

    def __init__(self):
        super().__init__()
        up = nn.Upsample(scale_factor=(1, 2, 2), mode="trilinear")
        self.convtsp1 = nn.Sequential(nn.Conv3d(1024, 832, (1, 3, 3), 1, (0, 1, 1), bias=False), nn.ReLU(), up)
        self.convtsp2 = nn.Sequential(nn.Conv3d(832, 480, (3, 3, 3), (3, 1, 1), (0, 1, 1), bias=False), nn.ReLU(), up)
        self.convtsp3 = nn.Sequential(nn.Conv3d(480, 192, (5, 3, 3), (5, 1, 1), (0, 1, 1), bias=False), nn.ReLU(), up)
        self.convtsp4 = nn.Sequential(
            nn.Conv3d(192, 64, (5, 3, 3), (5, 1, 1), (0, 1, 1), bias=False), nn.ReLU(), up,
            nn.Conv3d(64, 32, (2, 3, 3), (2, 1, 1), (0, 1, 1), bias=False), nn.ReLU(), up,
            nn.Conv3d(32, 32, (2, 1, 1), (2, 1, 1), bias=False), nn.ReLU(),
            nn.Conv3d(32, 1, 1, 1, bias=True), nn.Sigmoid(),
        )

    def forward(self, y0, y1, y2, y3):
        z = self.convtsp1(y0)
        z = self.convtsp2(torch.cat([z, y1], 2))
        z = self.convtsp3(torch.cat([z, y2], 2))
        z = self.convtsp4(torch.cat([z, y3], 2))
        return z.view(z.size(0), z.size(3), z.size(4))


class TViNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()
        self.decoder = TDecoder32()

    def forward(self, x):
        y0, y1, y2, y3 = self.backbone(x)
        return self.decoder(y0, y1, y2, y3)


def kinetics_style_state_dict(backbone: TBackbone) -> dict:
    """Re-key a structured backbone state_dict into the flat 'base.N.*' naming
    of the published S3D_kinetics400.pt (base.0..base.15 with pools at
    1,4,7,13), to exercise the converter's name surgery."""
    flat_map = {  # our (stage, idx) -> kinetics base index
        ("base1", "0"): 0, ("base1", "2"): 2, ("base1", "3"): 3,
        ("base2", "0"): 5, ("base2", "1"): 6,
        ("base3", "0"): 8, ("base3", "1"): 9, ("base3", "2"): 10,
        ("base3", "3"): 11, ("base3", "4"): 12,
        ("base4", "0"): 14, ("base4", "1"): 15,
    }
    out = {}
    for name, v in backbone.state_dict().items():
        parts = name.split(".")
        key = (parts[0], parts[1])
        out["base.%d.%s" % (flat_map[key], ".".join(parts[2:]))] = v
    return out


class TSoundNet(nn.Module):
    """SoundNet with the reference's conv-2d-as-1d naming (convN/batchnormN +
    dormant conv8 heads) for converter tests."""

    PLAN = [(1, 16, 64, 2, 32, 8), (16, 32, 32, 2, 16, 8), (32, 64, 16, 2, 8, 0),
            (64, 128, 8, 2, 4, 0), (128, 256, 4, 2, 2, 4), (256, 512, 4, 2, 2, 0),
            (512, 1024, 4, 2, 2, 0)]

    def __init__(self):
        super().__init__()
        for n, (i, o, k, s, p, pool) in enumerate(self.PLAN, start=1):
            setattr(self, f"conv{n}", nn.Conv2d(i, o, (k, 1), (s, 1), (p, 0)))
            setattr(self, f"batchnorm{n}", nn.BatchNorm2d(o, eps=1e-5, momentum=0.1))
            if pool:
                setattr(self, f"maxpool{n}", nn.MaxPool2d((pool, 1), (pool, 1)))
        self.conv8_objs = nn.Conv2d(1024, 1000, (8, 1), (2, 1))
        self.conv8_scns = nn.Conv2d(1024, 401, (8, 1), (2, 1))

    def forward(self, x):  # x: (B, 1, L, 1)
        for n, (_, _, _, _, _, pool) in enumerate(self.PLAN, start=1):
            x = torch.relu(getattr(self, f"batchnorm{n}")(getattr(self, f"conv{n}")(x)))
            if pool:
                x = getattr(self, f"maxpool{n}")(x)
        return x


class TAViNet(nn.Module):
    """Bilinear-fusion AViNet twin (visual_model/audionet/bilinear naming)."""

    def __init__(self):
        super().__init__()
        self.visual_model = TViNet()
        self.audionet = TSoundNet()
        self.maxpool = nn.MaxPool3d((4, 1, 1), stride=(2, 1, 2))
        self.bilinear = nn.Bilinear(42, 3, 4 * 7 * 12)

    def forward(self, x, audio):
        a = self.audionet(audio)
        y0, y1, y2, y3 = self.visual_model.backbone(x)
        y0 = self.maxpool(y0)
        fused = self.bilinear(y0.flatten(2), a.flatten(2))
        fused = fused.view(fused.size(0), fused.size(1), 4, 7, 12)
        return self.visual_model.decoder(fused, y1, y2, y3)


class TAViNetRefine(nn.Module):
    """Bilinear AViNet with the use_transformer=True self-attention refinement
    (reference model.py:211-221,239-247): conv_in_1x1 1024->C, sequence = the
    C channels (tokens of size 336 = 4*7*12), sin/cos PE over max_len=C, 3
    encoder layers (feat 336, hidden 336), conv_out_1x1 C->1024."""

    def __init__(self, c=32):
        super().__init__()
        self.visual_model = TViNet()
        self.audionet = TSoundNet()
        self.maxpool = nn.MaxPool3d((4, 1, 1), stride=(2, 1, 2))
        self.bilinear = nn.Bilinear(42, 3, 4 * 7 * 12)
        self.conv_in_1x1 = nn.Conv3d(1024, c, 1, bias=True)
        self.conv_out_1x1 = nn.Conv3d(c, 1024, 1, bias=True)
        enc = nn.TransformerEncoderLayer(336, 4, 336, dropout=0.0)
        self.transformer = nn.Module()
        self.transformer.transformer_encoder = nn.TransformerEncoder(enc, 3)
        import math as _math

        pe = torch.zeros(c, 336)
        pos = torch.arange(c, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, 336, 2).float() * (-_math.log(10000.0) / 336))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(1))  # (C, 1, 336)

    def forward(self, x, audio):
        a = self.audionet(audio)
        y0, y1, y2, y3 = self.visual_model.backbone(x)
        y0 = self.maxpool(y0)
        fused = self.bilinear(y0.flatten(2), a.flatten(2))
        fused = fused.view(fused.size(0), fused.size(1), 4, 7, 12)
        z = self.conv_in_1x1(fused).flatten(2).permute(1, 0, 2)  # (C, B, 336)
        z = self.transformer.transformer_encoder(z + self.pe)
        z = z.permute(1, 0, 2).view(z.size(1), z.size(0), 4, 7, 12)
        fused = self.conv_out_1x1(z)
        return self.visual_model.decoder(fused, y1, y2, y3)


class TAViNetFusion(nn.Module):
    """Transformer-fusion AViNet twin: conv_in_1x1 / audio_conv_1x1 /
    transformer.transformer_encoder naming (reference model.py:116-189)."""

    def __init__(self, c=512):
        super().__init__()
        self.visual_model = TViNet()
        self.audionet = TSoundNet()
        self.conv_in_1x1 = nn.Conv3d(1024, c, 1, bias=True)
        self.audio_conv_1x1 = nn.Conv2d(1024, c, 1, bias=True)
        enc = nn.TransformerEncoderLayer(c, 4, c, dropout=0.0)
        self.transformer = nn.Module()
        self.transformer.transformer_encoder = nn.TransformerEncoder(enc, 3)
        import math as _math

        pe = torch.zeros(339, c)
        pos = torch.arange(339, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, c, 2).float() * (-_math.log(10000.0) / c))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(1))
        self.c = c

    def forward(self, x, audio):
        a = self.audio_conv_1x1(self.audionet(audio)).flatten(2)  # (B,C,3)
        y0, y1, y2, y3 = self.visual_model.backbone(x)
        v = self.conv_in_1x1(y0).flatten(2)  # (B,C,336)
        fused = torch.cat([v, a], 2).permute(2, 0, 1)  # (339,B,C)
        fused = self.transformer.transformer_encoder(fused + self.pe)
        fused = fused.permute(1, 2, 0)  # (B,C,339)
        vid = fused[..., :336].view(-1, self.c, 4, 7, 12)
        aud = fused[..., 336:].mean(dim=2).view(-1, self.c, 1, 1, 1).repeat(1, 1, 4, 7, 12)
        return self.visual_model.decoder(torch.cat([vid, aud], 1), y1, y2, y3)
