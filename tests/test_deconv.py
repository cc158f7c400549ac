"""ConvTranspose2x2 (ops/deconv.py) must be bit-for-bit interchangeable
with flax nn.ConvTranspose((2,2), strides=(2,2), padding='VALID',
transpose_kernel=True): same param tree, same forward, and its custom
phase-matmul VJP must match XLA autodiff of the stock op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from bihome_tpu.ops.deconv import ConvTranspose2x2


def _stock(features, use_bias):
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2),
                            padding='VALID', use_bias=use_bias,
                            transpose_kernel=True, name='d')


@pytest.mark.parametrize('use_bias', [True, False])
def test_matches_flax_fwd_and_params(use_bias):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 5, 7, 6), jnp.float32)
    ours = ConvTranspose2x2(4, use_bias=use_bias, name='d')
    stock = _stock(4, use_bias)
    vo = ours.init(key, x)
    vs = stock.init(key, x)
    # identical param tree (names, shapes, values under the same rng)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), vo, vs)
    yo = ours.apply(vo, x)
    ys = stock.apply(vs, x)
    assert yo.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(yo), np.asarray(ys),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('use_bias', [True, False])
def test_custom_vjp_matches_autodiff(use_bias):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (3, 4, 6, 5), jnp.float32)
    ours = ConvTranspose2x2(8, use_bias=use_bias, name='d')
    stock = _stock(8, use_bias)
    v = ours.init(key, x)

    def loss(mod):
        def f(params, x):
            y = mod.apply({'params': params}, x)
            return jnp.sum(jnp.sin(y) * y)
        return f

    go = jax.grad(loss(ours), argnums=(0, 1))(v['params'], x)
    gs = jax.grad(loss(stock), argnums=(0, 1))(v['params'], x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5), go, gs)


class TestFusedDeconvConv3x3:
    """fused_deconv_conv3x3 == conv3x3(SAME)(ConvTranspose2x2(x)) exactly
    (same params), including gradients, odd sizes, and the bias border
    field; and ResNet50DeconvBlock keeps an identical param tree and output
    under BIHOME_DECONV_FUSE on/off."""

    def _reference(self, x, wd, bd, w1):
        u0 = nn.ConvTranspose(wd.shape[2], (2, 2), strides=(2, 2),
                              padding='VALID', use_bias=False,
                              transpose_kernel=True,
                              name='d').apply({'params': {'kernel': wd}}, x)
        u0 = u0 + bd
        return jax.lax.conv_general_dilated(
            u0, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    @pytest.mark.parametrize('hw,cin,cout', [((4, 6), 5, 3), ((7, 5), 3, 4)])
    def test_forward_matches_composition(self, hw, cin, cout):
        from bihome_tpu.ops.deconv import fused_deconv_conv3x3
        rng = np.random.RandomState(0)
        cmid = cin + 1
        x = jnp.asarray(rng.randn(2, *hw, cin).astype(np.float32))
        wd = jnp.asarray(rng.randn(2, 2, cmid, cin).astype(np.float32))
        bd = jnp.asarray(rng.randn(cmid).astype(np.float32))
        w1 = jnp.asarray(rng.randn(3, 3, cmid, cout).astype(np.float32))
        got = fused_deconv_conv3x3(x, wd, bd, w1)
        want = self._reference(x, wd, bd, w1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize('bwd_impl', ['phase', 'xla'])
    def test_gradients_match_composition(self, bwd_impl, monkeypatch):
        monkeypatch.setenv('BIHOME_DC_BWD', bwd_impl)
        from bihome_tpu.ops.deconv import fused_deconv_conv3x3
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 4, 5, 3).astype(np.float32))
        wd = jnp.asarray(rng.randn(2, 2, 4, 3).astype(np.float32))
        bd = jnp.asarray(rng.randn(4).astype(np.float32))
        w1 = jnp.asarray(rng.randn(3, 3, 4, 2).astype(np.float32))

        def s(fn):
            return jax.grad(
                lambda *a: jnp.sum(jnp.sin(fn(*a))),
                argnums=(0, 1, 2, 3))(x, wd, bd, w1)

        got = s(fused_deconv_conv3x3)
        want = s(self._reference)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_block_fused_vs_unfused_same_tree_and_output(self, monkeypatch):
        from bihome_tpu.models.blocks import ResNet50DeconvBlock
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 8),
                              jnp.float32)
        block = ResNet50DeconvBlock()

        def run(mode):
            monkeypatch.setenv('BIHOME_DECONV_FUSE', mode)
            v = block.init(jax.random.PRNGKey(3), x, train=True)
            y, mut = block.apply(v, x, train=True,
                                 mutable=['batch_stats'])
            return v, np.asarray(y), mut

        v_f, y_f, _ = run('on')
        v_u, y_u, _ = run('off')
        # identical tree: same names, shapes AND init values
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), v_f, v_u)
        np.testing.assert_allclose(y_f, y_u, rtol=1e-4, atol=1e-4)


class TestFusedDeconvConvBNRelu:
    """BIHOME_DECONV_BN=fused folds upper_bn1+ReLU into the fused deconv
    block's custom VJP (backward reconstructs the BN input from the block
    output — ops/deconv._pcbr). Must match the unfused composition in
    outputs, running-stat updates, and every cotangent."""

    def _block_run(self, monkeypatch, bn_mode, train=True):
        from bihome_tpu.models.blocks import ResNet50DeconvBlock
        monkeypatch.setenv('BIHOME_DECONV_FUSE', 'on')
        monkeypatch.setenv('BIHOME_DECONV_BN', bn_mode)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 6, 8),
                              jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(6), (2, 12, 12, 4),
                              jnp.float32)
        block = ResNet50DeconvBlock()
        v = block.init(jax.random.PRNGKey(3), x, train=True)

        def loss(params, x):
            y, mut = block.apply({**v, 'params': params}, x, train=train,
                                 mutable=['batch_stats'])
            return jnp.sum(y * g), mut

        (val, mut), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(v['params'], x)
        return val, mut, grads

    def test_train_outputs_stats_and_gradients(self, monkeypatch):
        val_f, mut_f, g_f = self._block_run(monkeypatch, 'fused')
        val_u, mut_u, g_u = self._block_run(monkeypatch, 'off')
        np.testing.assert_allclose(float(val_f), float(val_u),
                                   rtol=1e-5, atol=1e-5)
        # running-average updates identical (flax momentum rule)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            mut_f, mut_u)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            g_f, g_u)

    def test_eval_matches_unfused(self, monkeypatch):
        val_f, _, _ = self._block_run(monkeypatch, 'fused', train=False)
        val_u, _, _ = self._block_run(monkeypatch, 'off', train=False)
        np.testing.assert_allclose(float(val_f), float(val_u),
                                   rtol=1e-5, atol=1e-5)

    def test_relu_dead_zone_cotangent(self, monkeypatch):
        """The backward reconstructs z_hat only where y > 0; elements the
        ReLU clipped must contribute exactly zero, matching autodiff even
        when most of the map is dead (large negative bn bias)."""
        from bihome_tpu.ops import deconv as dc
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 4, 5, 3).astype(np.float32))
        wd = jnp.asarray(rng.randn(2, 2, 4, 3).astype(np.float32))
        bd = jnp.asarray(rng.randn(4).astype(np.float32))
        w1 = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
        gamma = jnp.asarray(rng.rand(6).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(6).astype(np.float32) - 1.0)
        zeros = jnp.zeros((6,), jnp.float32)
        ones = jnp.ones((6,), jnp.float32)

        def fused(x, wd, bd, w1, gamma, beta):
            y, _, _ = dc.fused_deconv_conv3x3_bn_relu(
                x, wd, bd, w1, gamma, beta, zeros, ones, train=True)
            return jnp.sum(jnp.sin(y))

        def unfused(x, wd, bd, w1, gamma, beta):
            z = dc.fused_deconv_conv3x3(x, wd, bd, w1)
            zf = z.astype(jnp.float32)
            mu = jnp.mean(zf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(zf), axis=(0, 1, 2)) - mu * mu
            inv = jax.lax.rsqrt(var + 1e-5)
            y = jnp.maximum((zf - mu) * (inv * gamma) + beta, 0.0)
            return jnp.sum(jnp.sin(y))

        gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4, 5))(
            x, wd, bd, w1, gamma, beta)
        gu = jax.grad(unfused, argnums=(0, 1, 2, 3, 4, 5))(
            x, wd, bd, w1, gamma, beta)
        for a, b in zip(gf, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
