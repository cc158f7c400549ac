"""Residual / bottleneck / transpose-conv block library for the Rethinking
backbone — flax equivalents of the reference block zoo
(ref: src/backbones/utils.py:4-152). NHWC layout.

Naming: 'upper' = main branch, 'lower' = shortcut branch, mirroring the
reference's upper_branch/lower_branch so weight ports stay mechanical.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax.linen import initializers

from bihome_tpu.models.resnet import conv_init
from bihome_tpu.ops.deconv import (ConvTranspose2x2, fused_deconv_conv3x3,
                                   fused_deconv_conv3x3_bn_relu)


class _RawParams(nn.Module):
    """Declares params under this module's scope without computing anything
    — used by fused paths to own the SAME param tree (names, shapes, inits)
    as the stock modules they replace, so checkpoints/ports are unaffected."""
    specs: Tuple[Tuple[str, Tuple[int, ...], Callable], ...]

    @nn.compact
    def __call__(self):
        return tuple(self.param(name, init, shape, jnp.float32)
                     for name, shape, init in self.specs)


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class _BNVars(nn.Module):
    """Owns a BatchNorm's param/stat tree (same names/shapes/inits as flax
    ``nn.BatchNorm``: params scale/bias, batch_stats mean/var) for fused
    paths that compute the normalization themselves. Call once to read
    ``(scale, bias, mean, var)``; call again with batch stats to apply the
    running-average update (flax rule: m*old + (1-m)*batch)."""
    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, mu=None, var=None):
        scale = self.param('scale', initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param('bias', initializers.zeros_init(),
                          (self.features,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((self.features,),
                                                  jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((self.features,),
                                                jnp.float32))
        if mu is not None and not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mu)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return scale, bias, ra_mean.value, ra_var.value


class ResNet34ConvBlock(nn.Module):
    """Two 3x3 convs + projection shortcut when shape changes
    (ref: src/backbones/utils.py:85-112)."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        upper = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                        padding=1, use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name='upper_conv1')(x)
        upper = _bn(train, self.dtype, 'upper_bn1')(upper)
        upper = nn.relu(upper)
        upper = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv2')(upper)
        upper = _bn(train, self.dtype, 'upper_bn2')(upper)
        if x.shape[-1] != self.features:
            lower = nn.Conv(self.features, (1, 1),
                            strides=(self.stride,) * 2, use_bias=False,
                            kernel_init=conv_init, dtype=self.dtype,
                            name='lower_conv')(x)
            lower = _bn(train, self.dtype, 'lower_bn')(lower)
        else:
            lower = x
        return nn.relu(upper + lower)


class ResNet34IdentityBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (ref: src/backbones/utils.py:115-131)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        upper = nn.Conv(features, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv1')(x)
        upper = _bn(train, self.dtype, 'upper_bn1')(upper)
        upper = nn.relu(upper)
        upper = nn.Conv(features, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv2')(upper)
        upper = _bn(train, self.dtype, 'upper_bn2')(upper)
        return nn.relu(upper + x)


class ResNet50ConvBlock(nn.Module):
    """Bottleneck conv block with mid = in//stride
    (ref: src/backbones/utils.py:4-29)."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // self.stride
        upper = nn.Conv(mid, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name='upper_conv1')(x)
        upper = _bn(train, self.dtype, 'upper_bn1')(upper)
        upper = nn.relu(upper)
        upper = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv2')(upper)
        upper = _bn(train, self.dtype, 'upper_bn2')(upper)
        upper = nn.relu(upper)
        upper = nn.Conv(self.features, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv3')(upper)
        upper = _bn(train, self.dtype, 'upper_bn3')(upper)
        lower = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name='lower_conv')(x)
        lower = _bn(train, self.dtype, 'lower_bn')(lower)
        return nn.relu(upper + lower)


class ResNet50IdentityBlock(nn.Module):
    """in -> in/4 -> in/4 -> in bottleneck, identity shortcut
    (ref: src/backbones/utils.py:32-57)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        upper = nn.Conv(features // 4, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv1')(x)
        upper = _bn(train, self.dtype, 'upper_bn1')(upper)
        upper = nn.relu(upper)
        upper = nn.Conv(features // 4, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv2')(upper)
        upper = _bn(train, self.dtype, 'upper_bn2')(upper)
        upper = nn.relu(upper)
        upper = nn.Conv(features, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv3')(upper)
        upper = _bn(train, self.dtype, 'upper_bn3')(upper)
        return nn.relu(upper + x)


class ResNet50DeconvBlock(nn.Module):
    """2x upsampling block: in -> in/2 channels
    (ref: src/backbones/utils.py:60-82)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        # deconv2x2+conv3x3 compose into one lane-full phase-conv2x2
        # (ops/deconv.fused_deconv_conv3x3): 2.5x fewer FLOPs, no full-res
        # intermediate in HBM. Exact reparameterization — same params.
        # BIHOME_DECONV_FUSE=off restores the two-op composition.
        fuse_deconv = os.environ.get('BIHOME_DECONV_FUSE', 'on') != 'off'
        # BN+ReLU folded into the fused block's custom VJP: the backward
        # reconstructs the BN input from the block OUTPUT, so the pre-BN
        # full-res activation is never saved as an autodiff residual
        # (ops/deconv.fused_deconv_conv3x3_bn_relu). Same param tree.
        # Measured r5 (BENCH_NOTES): zeng 2,090 vs 2,097 pairs/s —
        # neutral; the pass-count saving is offset by the z_hat residual
        # (the residual-free formulation is mathematically impossible:
        # BN's batch-stat feedback is dense in z_hat). Default off.
        fuse_bn = (fuse_deconv and
                   os.environ.get('BIHOME_DECONV_BN', 'off') == 'fused')
        if fuse_deconv:
            wd, bd = _RawParams(
                specs=(('kernel', (2, 2, features, features),
                        initializers.lecun_normal()),
                       ('bias', (features,), initializers.zeros_init())),
                name='upper_deconv')()
            (w1,) = _RawParams(
                specs=(('kernel', (3, 3, features, features), conv_init),),
                name='upper_conv1')()
            if fuse_bn:
                bn_vars = _BNVars(features=features, name='upper_bn1')
                scale, bias, ra_mean, ra_var = bn_vars()
                upper, mu, var = fused_deconv_conv3x3_bn_relu(
                    x.astype(self.dtype), wd, bd, w1, scale, bias,
                    ra_mean, ra_var, train=train, dtype=self.dtype)
                if train:
                    bn_vars(mu, var)
            else:
                upper = fused_deconv_conv3x3(x.astype(self.dtype), wd, bd,
                                             w1, dtype=self.dtype)
        else:
            upper = ConvTranspose2x2(features, use_bias=True,
                                     dtype=self.dtype,
                                     name='upper_deconv')(x)
            upper = nn.Conv(features, (3, 3), padding=1, use_bias=False,
                            kernel_init=conv_init, dtype=self.dtype,
                            name='upper_conv1')(upper)
        if not fuse_bn:
            upper = _bn(train, self.dtype, 'upper_bn1')(upper)
            upper = nn.relu(upper)
        upper = nn.Conv(features // 2, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv2')(upper)
        upper = _bn(train, self.dtype, 'upper_bn2')(upper)
        lower = ConvTranspose2x2(features // 2, use_bias=False,
                                 dtype=self.dtype, name='lower_deconv')(x)
        lower = _bn(train, self.dtype, 'lower_bn')(lower)
        return nn.relu(upper + lower)


class ResNet34DeconvBlock(nn.Module):
    """2x upsampling block, ResNet34 flavor (ref: src/backbones/utils.py:134-152).
    Not used by any shipped config but kept for block-library parity."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        upper = ConvTranspose2x2(features // 2, use_bias=True,
                                 dtype=self.dtype, name='upper_deconv')(x)
        upper = nn.Conv(features // 2, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='upper_conv1')(upper)
        upper = _bn(train, self.dtype, 'upper_bn1')(upper)
        lower = ConvTranspose2x2(features // 2, use_bias=False,
                                 dtype=self.dtype, name='lower_deconv')(x)
        lower = _bn(train, self.dtype, 'lower_bn')(lower)
        return nn.relu(upper + lower)
