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
