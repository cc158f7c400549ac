"""Minimal torch ResNet oracle with torchvision-compatible state_dict keys.

torchvision is not installed in this environment; this is an independent
implementation of the standard ResNet-v1 architecture (He et al. 2015,
torchvision layout: conv1/bn1/layer{1-4}.{i}.{conv,bn}{1,2}/downsample/fc)
used purely as a numeric oracle for weight-port parity tests.
"""

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class ResNet34(nn.Module):
    def __init__(self, num_classes=1000, in_channels=3, sizes=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        chans = [64, 128, 256, 512]
        in_ch = 64
        for li, (ch, n) in enumerate(zip(chans, sizes), start=1):
            layers = []
            for bi in range(n):
                stride = 2 if (li > 1 and bi == 0) else 1
                layers.append(BasicBlock(in_ch, ch, stride))
                in_ch = ch
            setattr(self, f'layer{li}', nn.Sequential(*layers))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)

    def forward_features_layer1(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer1(x)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


class ResNet18(ResNet34):
    """Same v1 layout with [2,2,2,2] blocks (DSAC ScoreCNN's base,
    ref: src/heads/ransac_utils.py:16)."""
    def __init__(self, num_classes=1000, in_channels=3):
        super().__init__(num_classes, in_channels, sizes=(2, 2, 2, 2))
