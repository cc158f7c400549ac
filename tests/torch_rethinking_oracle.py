"""Torch oracle of the reference Rethinking backbone + ContentAware subnets
with reference-identical state_dict keys.

Independent re-implementations (from the architecture described at
ref: src/backbones/Rethinking.py:27-149 and src/backbones/utils.py:4-152,
src/backbones/ContentAware.py:6-80) used purely as numeric oracles for the
full-checkpoint import parity tests — NOT part of the shipped framework.
"""

import torch
import torch.nn as nn


class R34ConvBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.upper_branch = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1,
                      bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(),
            nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch))
        self.lower_is_identity = in_ch == out_ch
        if not self.lower_is_identity:
            self.lower_branch = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch))

    def forward(self, x):
        lower = x if self.lower_is_identity else self.lower_branch(x)
        return nn.ReLU()(self.upper_branch(x) + lower)


class R34IdentityBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.upper_branch = nn.Sequential(
            nn.Conv2d(ch, ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(ch), nn.ReLU(),
            nn.Conv2d(ch, ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(ch))

    def forward(self, x):
        return nn.ReLU()(self.upper_branch(x) + x)


class R50DeconvBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.upper_branch = nn.Sequential(
            nn.ConvTranspose2d(ch, ch, 2, stride=2),
            nn.Conv2d(ch, ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(ch), nn.ReLU(),
            nn.Conv2d(ch, ch // 2, 1, bias=False),
            nn.BatchNorm2d(ch // 2))
        self.lower_branch = nn.Sequential(
            nn.ConvTranspose2d(ch, ch // 2, 2, stride=2, bias=False),
            nn.BatchNorm2d(ch // 2))

    def forward(self, x):
        return nn.ReLU()(self.upper_branch(x) + self.lower_branch(x))


class RethinkingTorch(nn.Module):
    """ResNet34-flavor Rethinking FCN: 2-ch input -> 2-ch PF at input res."""

    def __init__(self):
        super().__init__()
        self.layer1 = nn.Sequential(
            nn.Conv2d(2, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(), nn.MaxPool2d(3, 2, padding=1))
        self.layer2 = nn.Sequential(R34ConvBlock(64, 64, 1),
                                    R34IdentityBlock(64),
                                    R34IdentityBlock(64))
        self.layer3 = nn.Sequential(R34ConvBlock(64, 128, 2),
                                    *[R34IdentityBlock(128)
                                      for _ in range(3)])
        self.layer4 = nn.Sequential(R34ConvBlock(128, 256, 2),
                                    *[R34IdentityBlock(256)
                                      for _ in range(5)],
                                    R50DeconvBlock(256))
        self.layer5 = nn.Sequential(*[R34IdentityBlock(128)
                                      for _ in range(3)],
                                    R50DeconvBlock(128))
        self.layer6 = nn.Sequential(*[R34IdentityBlock(64)
                                      for _ in range(2)],
                                    R50DeconvBlock(64))
        self.layer7 = nn.Sequential(R34IdentityBlock(32),
                                    R50DeconvBlock(32))
        self.layer8 = nn.Sequential(nn.Conv2d(16, 128, 1),
                                    nn.BatchNorm2d(128), nn.ReLU(),
                                    nn.Conv2d(128, 2, 1))

    def forward(self, x):
        for i in range(1, 9):
            x = getattr(self, f'layer{i}')(x)
        return x


class MaskPredictorTorch(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [(1, 4), (4, 8), (8, 16), (16, 32), (32, 1)]
        for i, (ci, co) in enumerate(chans, start=1):
            setattr(self, f'layer{i}', nn.Sequential(
                nn.Conv2d(ci, co, 3, padding=1, bias=False),
                nn.BatchNorm2d(co)))

    def forward(self, x):
        for i in range(1, 5):
            x = torch.relu(getattr(self, f'layer{i}')(x))
        return torch.sigmoid(self.layer5(x))


class FeatureExtractorTorch(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [(1, 4), (4, 8), (8, 1)]
        for i, (ci, co) in enumerate(chans, start=1):
            setattr(self, f'layer{i}', nn.Sequential(
                nn.Conv2d(ci, co, 3, padding=1, bias=False),
                nn.BatchNorm2d(co)))

    def forward(self, x):
        for i in range(1, 4):
            x = torch.relu(getattr(self, f'layer{i}')(x))
        return x


def randomize_bn_stats(module, rng):
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real test (fresh modules have mean=0/var=1 which would mask porting
    bugs in the stats)."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features) * 0.1, dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.rand(m.num_features) * 0.5 + 0.75, dtype=torch.float32))
