"""Torchvision-compatible ResNet in flax.linen (NHWC, TPU layout).

Used three ways, mirroring the reference:
  * the 'ResNet34' regression backbone — 2-channel input, 8 outputs
    (ref: src/backbones/ResNet34.py:15-19),
  * the frozen biHomE AuxiliaryResnet — truncated after ``output_layer``
    (ref: src/heads/PerceptualHead.py:15-76),
  * DSAC's ScoreCNN — resnet18, 2-channel input, 1 output
    (ref: src/heads/ransac_utils.py:10-23).

Parameter naming mirrors torchvision state_dict keys (conv1, bn1,
layer{1-4}_{i}, fc) so torch .pth weights port mechanically
(see models/torch_port.py). BatchNorm matches torch defaults:
eps=1e-5, running-stat momentum 0.1 (flax momentum 0.9).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from bihome_tpu.ops import pool as pool_ops

# kaiming_normal(fan_out) — torchvision's resnet conv init.
conv_init = nn.initializers.variance_scaling(2.0, 'fan_out',
                                             'truncated_normal')


class BasicBlock(nn.Module):
    """Torchvision BasicBlock (two 3x3 convs, expansion 1)."""
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, kernel_init=conv_init,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name='conv2')(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn2')(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name='downsample_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Torchvision Bottleneck (1x1-3x3-1x1, expansion 4)."""
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, kernel_init=conv_init,
                      dtype=self.dtype, name='conv2')(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name='conv3')(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name='downsample_bn')(identity)
        return nn.relu(out + identity)


_ARCHS = {
    'resnet18': (BasicBlock, (2, 2, 2, 2), 1),
    'resnet34': (BasicBlock, (3, 4, 6, 3), 1),
    'resnet50': (Bottleneck, (3, 4, 6, 3), 4),
    'resnet101': (Bottleneck, (3, 4, 23, 3), 4),
    'resnet152': (Bottleneck, (3, 8, 36, 3), 4),
}


class ResNet(nn.Module):
    """Torchvision-layout ResNet, NHWC.

    ``output_layer``: None -> pooled logits [B, num_classes];
    k in {1..4} -> feature map after layer{k} [B, H/2^(k+1), W/2^(k+1), C]
    (the AuxiliaryResnet truncation, ref: src/heads/PerceptualHead.py:25-33,
    50-76).
    """
    arch: str = 'resnet34'
    num_classes: int = 1000
    output_layer: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_sizes, expansion = _ARCHS[self.arch]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = pool_ops.max_pool(x, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))

        features = 64
        for stage, num_blocks in enumerate(stage_sizes):
            if self.output_layer is not None and stage + 1 > self.output_layer:
                return x
            for i in range(num_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                downsample = (stride != 1
                              or x.shape[-1] != features * expansion)
                x = block_cls(features=features, stride=stride,
                              downsample=downsample, dtype=self.dtype,
                              name=f'layer{stage + 1}_{i}')(x, train=train)
            features *= 2
        if self.output_layer is not None:
            return x

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, name='fc')(x)
        return x
