"""The four reference backbones as flax modules (NHWC, data-dict protocol).

Protocol (mirrors ref: SURVEY §2.3): a backbone consumes ``PATCH_KEYS`` from
the batch dict and returns a dict of new entries keyed by ``TARGET_KEYS``
(plus masks/features for ContentAware). 'DoubleLine' variants run a second
pass with the patch order swapped, sharing weights
(ref: src/backbones/ResNet34.py:42-45 etc.).

TPU note: instead of two sequential forwards, DoubleLine stacks the swapped
concatenation into one [2B, ...] batch so the convs hit the MXU once with
twice the batch — same math, half the kernel launches.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bihome_tpu.models import blocks
from bihome_tpu.ops import pool as pool_ops
from bihome_tpu.models.resnet import ResNet, conv_init

Array = Any


class PFHead(nn.Module):
    """Stage-8 perspective-field head: 1x1 conv -> BN -> ReLU -> 1x1 conv
    (ref: src/backbones/Rethinking.py:140-149).

    On TPU this runs as ONE fused Pallas kernel (ops/fused_head.py) — the
    plain composition materializes the [B,H,W,mid] activation at full patch
    resolution in HBM three times per step (~7 ms/step at batch 64,
    bandwidth-bound). The reference composition below shares the same
    parameters and is used on other backends / with BIHOME_PF_HEAD=ref.
    """
    mid: int
    out: int = 2
    dtype: Any = jnp.float32
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cin = x.shape[-1]
        w1 = self.param('conv1_kernel', conv_init, (1, 1, cin, self.mid),
                        jnp.float32)
        b1 = self.param('conv1_bias', nn.initializers.zeros, (self.mid,),
                        jnp.float32)
        scale = self.param('bn_scale', nn.initializers.ones, (self.mid,),
                           jnp.float32)
        bias = self.param('bn_bias', nn.initializers.zeros, (self.mid,),
                          jnp.float32)
        w2 = self.param('conv2_kernel', conv_init, (1, 1, self.mid,
                                                    self.out), jnp.float32)
        b2 = self.param('conv2_bias', nn.initializers.zeros, (self.out,),
                        jnp.float32)
        ra_mean = self.variable('batch_stats', 'bn_mean',
                                lambda: jnp.zeros((self.mid,), jnp.float32))
        ra_var = self.variable('batch_stats', 'bn_var',
                               lambda: jnp.ones((self.mid,), jnp.float32))

        use_fused = (jax.default_backend() == 'tpu'
                     and os.environ.get('BIHOME_PF_HEAD', 'fused') == 'fused'
                     and (x.shape[0] * x.shape[1] * x.shape[2]) % 128 == 0)
        if use_fused:
            from bihome_tpu.ops import fused_head
            y, mu, var = fused_head.fused_pf_head(
                x.astype(self.dtype), w1, b1, scale, bias, w2, b2,
                ra_mean.value, ra_var.value, train=train, eps=self.eps)
        else:
            xc = x.astype(self.dtype)
            mid = jax.lax.dot_general(
                xc, w1.reshape(cin, self.mid).astype(self.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if train:
                mu = jnp.mean(mid.reshape(-1, self.mid), axis=0) + b1
                var = jnp.maximum(
                    jnp.mean(jnp.square(mid.reshape(-1, self.mid)
                                        + b1), axis=0) - mu * mu, 0.0)
            else:
                mu, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.eps)
            a = ((mid + b1 - mu) * inv * scale + bias).astype(self.dtype)
            r = nn.relu(a)
            y = jax.lax.dot_general(
                r, w2.reshape(self.mid, self.out).astype(self.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(self.dtype) + \
                b2.astype(self.dtype)

        if train and not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mu)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y.astype(self.dtype)


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class ResNet34Backbone(nn.Module):
    """'ResNet34' — the DeTone-style regression backbone
    (ref: src/backbones/ResNet34.py): torchvision resnet34 with a 2-channel
    stem and an 8-unit head reshaped to [B,4,2]."""
    patch_keys: Tuple[str, str] = ('patch_1', 'patch_2')
    target_keys: Tuple[str, ...] = ('delta_hat_12',)
    variant: str = 'oneline'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, Array],
                 train: bool = False) -> Dict[str, Array]:
        net = ResNet(arch='resnet34', num_classes=8, dtype=self.dtype,
                     name='resnet34')
        p1 = data[self.patch_keys[0]]
        p2 = data[self.patch_keys[1]]
        x12 = jnp.concatenate([p1, p2], axis=-1)
        out: Dict[str, Array] = {}
        if self.variant == 'doubleline':
            x21 = jnp.concatenate([p2, p1], axis=-1)
            stacked = jnp.concatenate([x12, x21], axis=0)      # [2B,...]
            o = net(stacked, train=train).reshape(-1, 4, 2)
            b = p1.shape[0]
            out[self.target_keys[0]] = o[:b]
            out[self.target_keys[1]] = o[b:]
        else:
            out[self.target_keys[0]] = net(x12, train=train).reshape(-1, 4, 2)
        return out


class RethinkingBackbone(nn.Module):
    """'Rethinking' — Zeng et al. fully-convolutional encoder/decoder
    producing a dense 2-channel perspective field at patch resolution
    (ref: src/backbones/Rethinking.py:27-149)."""
    patch_keys: Tuple[str, str] = ('patch_1', 'patch_2')
    target_keys: Tuple[str, ...] = ('pf_hat_12',)
    variant: str = 'oneline'
    resnet_block: str = 'ResNet34'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, Array],
                 train: bool = False) -> Dict[str, Array]:
        p1 = data[self.patch_keys[0]]
        p2 = data[self.patch_keys[1]]
        x12 = jnp.concatenate([p1, p2], axis=-1)
        out: Dict[str, Array] = {}
        if self.variant == 'doubleline':
            x21 = jnp.concatenate([p2, p1], axis=-1)
            stacked = jnp.concatenate([x12, x21], axis=0)
            o = self._forward(stacked, train)
            b = p1.shape[0]
            out[self.target_keys[0]] = o[:b]
            out[self.target_keys[1]] = o[b:]
        else:
            out[self.target_keys[0]] = self._forward(x12, train)
        return out

    def _forward(self, x, train: bool):
        dt = self.dtype
        r50 = self.resnet_block == 'ResNet50'

        # Stage 1: 7x7/2 stem + maxpool (ref: Rethinking.py:31-35).
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=dt, name='layer1_conv')(x)
        x = _bn(train, dt, 'layer1_bn')(x)
        x = nn.relu(x)
        x = pool_ops.max_pool(x, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))

        if r50:
            x = blocks.ResNet50ConvBlock(256, 1, dt, name='layer2_0')(x, train)
            x = blocks.ResNet50IdentityBlock(dt, name='layer2_1')(x, train)
            x = blocks.ResNet50IdentityBlock(dt, name='layer2_2')(x, train)
            x = blocks.ResNet50ConvBlock(512, 2, dt, name='layer3_0')(x, train)
            for i in range(1, 4):
                x = blocks.ResNet50IdentityBlock(
                    dt, name=f'layer3_{i}')(x, train)
            x = blocks.ResNet50ConvBlock(1024, 2, dt,
                                         name='layer4_0')(x, train)
            for i in range(1, 6):
                x = blocks.ResNet50IdentityBlock(
                    dt, name=f'layer4_{i}')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer4_deconv')(x, train)
            for i in range(3):
                x = blocks.ResNet50IdentityBlock(
                    dt, name=f'layer5_{i}')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer5_deconv')(x, train)
            for i in range(2):
                x = blocks.ResNet50IdentityBlock(
                    dt, name=f'layer6_{i}')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer6_deconv')(x, train)
            x = blocks.ResNet50IdentityBlock(dt, name='layer7_0')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer7_deconv')(x, train)
            head_mid = 512
        else:
            x = blocks.ResNet34ConvBlock(64, 1, dt, name='layer2_0')(x, train)
            x = blocks.ResNet34IdentityBlock(dt, name='layer2_1')(x, train)
            x = blocks.ResNet34IdentityBlock(dt, name='layer2_2')(x, train)
            x = blocks.ResNet34ConvBlock(128, 2, dt, name='layer3_0')(x, train)
            for i in range(1, 4):
                x = blocks.ResNet34IdentityBlock(
                    dt, name=f'layer3_{i}')(x, train)
            x = blocks.ResNet34ConvBlock(256, 2, dt, name='layer4_0')(x, train)
            for i in range(1, 6):
                x = blocks.ResNet34IdentityBlock(
                    dt, name=f'layer4_{i}')(x, train)
            # NOTE: the reference uses the ResNet50-flavor deconv block in
            # the ResNet34 configuration too (ref: Rethinking.py:88,105,120,133).
            x = blocks.ResNet50DeconvBlock(dt, name='layer4_deconv')(x, train)
            for i in range(3):
                x = blocks.ResNet34IdentityBlock(
                    dt, name=f'layer5_{i}')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer5_deconv')(x, train)
            for i in range(2):
                x = blocks.ResNet34IdentityBlock(
                    dt, name=f'layer6_{i}')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer6_deconv')(x, train)
            x = blocks.ResNet34IdentityBlock(dt, name='layer7_0')(x, train)
            x = blocks.ResNet50DeconvBlock(dt, name='layer7_deconv')(x, train)
            head_mid = 128

        # Stage 8: 1x1 head -> 2-channel PF (ref: Rethinking.py:140-149).
        # Fused Pallas kernel on TPU; see PFHead.
        return PFHead(mid=head_mid, out=2, dtype=dt, name='layer8')(x, train)


class MaskPredictor(nn.Module):
    """5-conv sigmoid attention mask (ref: src/backbones/ContentAware.py:6-52)."""
    fix_mask: bool = False
    normalization_strength: float = -1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fix_mask:
            return jnp.ones_like(x)
        widths = [4, 8, 16, 32, 1]
        out = x
        for i, wdt in enumerate(widths):
            out = nn.Conv(wdt, (3, 3), padding=1, use_bias=False,
                          kernel_init=conv_init, dtype=self.dtype,
                          name=f'conv{i + 1}')(out)
            out = _bn(train, self.dtype, f'bn{i + 1}')(out)
            out = nn.sigmoid(out) if i == len(widths) - 1 else nn.relu(out)
        if self.normalization_strength > 0:
            max_value = jnp.max(out.reshape(out.shape[0], -1), axis=1)
            out = out / (max_value.reshape(-1, 1, 1, 1)
                         * self.normalization_strength)
            out = jnp.clip(out, 0.0, 1.0)
        return out


class FeatureExtractor(nn.Module):
    """3-conv single-channel feature map
    (ref: src/backbones/ContentAware.py:55-80)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = x
        for i, wdt in enumerate([4, 8, 1]):
            out = nn.Conv(wdt, (3, 3), padding=1, use_bias=False,
                          kernel_init=conv_init, dtype=self.dtype,
                          name=f'conv{i + 1}')(out)
            out = _bn(train, self.dtype, f'bn{i + 1}')(out)
            out = nn.relu(out)
        return out


class ContentAwareBackbone(nn.Module):
    """'ContentAware' — Zhang et al. CA-UDHN
    (ref: src/backbones/ContentAware.py:83-193): shared mask predictor +
    feature extractor per patch, resnet34 regressor on masked features.

    setup-style so :meth:`extract_features` shares the feature-extractor
    params with __call__ (TripletHead re-runs it on warped patches,
    ref: src/heads/TripletHead.py:60,70).
    """
    patch_keys: Tuple[str, str] = ('patch_1', 'patch_2')
    mask_keys: Tuple[str, str] = ('mask_1', 'mask_2')
    feature_keys: Tuple[str, str] = ('feature_1', 'feature_2')
    target_keys: Tuple[str, ...] = ('delta_hat_12',)
    variant: str = 'doubleline'
    fix_mask: bool = False
    mask_normalization_strength: float = -1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.mask_predictor = MaskPredictor(
            fix_mask=self.fix_mask,
            normalization_strength=self.mask_normalization_strength,
            dtype=self.dtype, name='mask_predictor')
        self.feature_extractor = FeatureExtractor(dtype=self.dtype,
                                                  name='feature_extractor')
        self.resnet34 = ResNet(arch='resnet34', num_classes=8,
                               dtype=self.dtype, name='resnet34')

    def __call__(self, data: Dict[str, Array],
                 train: bool = False) -> Dict[str, Array]:
        p1 = data[self.patch_keys[0]]
        p2 = data[self.patch_keys[1]]
        stacked = jnp.concatenate([p1, p2], axis=0)            # [2B,...]
        m = self.mask_predictor(stacked, train=train)
        f = self.feature_extractor(stacked, train=train)
        g = m * f
        b = p1.shape[0]
        g1, g2 = g[:b], g[b:]

        out: Dict[str, Array] = {
            self.mask_keys[0]: m[:b], self.mask_keys[1]: m[b:],
            self.feature_keys[0]: f[:b], self.feature_keys[1]: f[b:],
        }
        g12 = jnp.concatenate([g1, g2], axis=-1)
        if self.variant == 'doubleline':
            g21 = jnp.concatenate([g2, g1], axis=-1)
            o = self.resnet34(jnp.concatenate([g12, g21], axis=0),
                              train=train).reshape(-1, 4, 2)
            out[self.target_keys[0]] = o[:b]
            out[self.target_keys[1]] = o[b:]
        else:
            out[self.target_keys[0]] = self.resnet34(
                g12, train=train).reshape(-1, 4, 2)
        return out

    def extract_features(self, x: Array, train: bool = False) -> Array:
        """Feature extractor on warped patches (TripletHead path)."""
        return self.feature_extractor(x, train=train)


class HomographyNetBackbone(nn.Module):
    """'HomographyNet' — original DeTone VGG-style regressor
    (ref: src/backbones/HomographyNet.py). Conv order is Conv->ReLU->BN
    like the reference. Not referenced by shipped configs; kept for parity."""
    patch_keys: Tuple[str, str] = ('patch_1', 'patch_2')
    target_keys: Tuple[str, ...] = ('delta_hat_12',)
    image_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, Array],
                 train: bool = False) -> Dict[str, Array]:
        x = jnp.concatenate([data[self.patch_keys[0]],
                             data[self.patch_keys[1]]], axis=-1)
        layout = [(64, False), (64, True), (64, False), (64, True),
                  (128, False), (128, True), (128, False)]
        if self.image_size == 128:
            layout += [(128, False)]
        elif self.image_size == 512:
            layout += [(128, True), (128, False), (128, True),
                       (128, False), (128, False)]
        for i, (wdt, pool) in enumerate(layout):
            x = nn.Conv(wdt, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f'conv{i + 1}')(x)
            x = nn.relu(x)
            x = _bn(train, self.dtype, f'bn{i + 1}')(x)
            if pool:
                x = pool_ops.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name='fc1')(x))
        x = nn.Dense(8, dtype=self.dtype, name='fc2')(x)
        return {self.target_keys[0]: x.reshape(-1, 4, 2)}


def build_backbone(cfg: Dict[str, Any], dtype=jnp.float32) -> nn.Module:
    """Construct a backbone from a reference MODEL.BACKBONE yaml section
    (ref: train.py:675-679)."""
    name = cfg['NAME']
    variant = str(cfg.get('VARIANT', 'OneLine')).lower()
    patch_keys = tuple(cfg['PATCH_KEYS'])
    target_keys = tuple(cfg['TARGET_KEYS'])
    if name == 'ResNet34':
        return ResNet34Backbone(patch_keys=patch_keys,
                                target_keys=target_keys,
                                variant=variant, dtype=dtype)
    if name == 'Rethinking':
        return RethinkingBackbone(patch_keys=patch_keys,
                                  target_keys=target_keys, variant=variant,
                                  resnet_block=cfg.get('RESNET_BLOCK',
                                                       'ResNet34'),
                                  dtype=dtype)
    if name == 'ContentAware':
        return ContentAwareBackbone(
            patch_keys=patch_keys,
            mask_keys=tuple(cfg['MASK_KEYS']),
            feature_keys=tuple(cfg['FEATURE_KEYS']),
            target_keys=target_keys, variant=variant,
            fix_mask=bool(cfg.get('FIX_MASK', False)),
            mask_normalization_strength=float(
                cfg.get('MASK_NORMALIZATION_STRENGTH', -1)),
            dtype=dtype)
    if name == 'HomographyNet':
        return HomographyNetBackbone(patch_keys=patch_keys,
                                     target_keys=target_keys,
                                     image_size=int(cfg.get('IMAGE_SIZE',
                                                            128)),
                                     dtype=dtype)
    raise ValueError(f'Unknown backbone: {name}')
