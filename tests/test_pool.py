"""ops/pool.py — argmax-routed max-pool backward vs XLA autodiff.

The custom VJP must be EXACT against lax.reduce_window autodiff
(SelectAndScatter), including first-match tie routing; the reference hits
the same semantics through torch max_pool2d (ref:
src/backbones/ResNet34.py:15-28, src/backbones/Rethinking.py:31-35).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bihome_tpu.ops import pool


@pytest.fixture(autouse=True)
def _taps_backward(monkeypatch):
    # The default is the conservative XLA autodiff path (see ops/pool.py);
    # these tests exist to pin the TAP backward's semantics. monkeypatch
    # scopes the override to this module — a module-level os.environ
    # assignment would leak the taps backward into every other test's
    # gradients (it is read at trace time).
    monkeypatch.setenv('BIHOME_MAXPOOL_BWD', 'taps')
    yield


CONFIGS = [
    # (window, strides, padding, in_hw) — the two call-site shapes plus
    # an odd-size case exercising ragged edge windows.
    ((3, 3), (2, 2), ((1, 1), (1, 1)), (64, 64)),   # resnet/Rethinking stem
    ((2, 2), (2, 2), ((0, 0), (0, 0)), (32, 32)),   # HomographyNet
    ((3, 3), (2, 2), ((1, 1), (1, 1)), (15, 17)),
]


def _xla_pool(x, window, strides, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        ((0, 0), padding[0], padding[1], (0, 0)))


@pytest.mark.parametrize('window,strides,padding,hw', CONFIGS)
def test_forward_matches_reduce_window(window, strides, padding, hw):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *hw, 5), jnp.float32)
    got = pool.max_pool(x, window, strides, padding)
    want = _xla_pool(x, window, strides, padding)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize('window,strides,padding,hw', CONFIGS)
def test_gradient_matches_xla_autodiff(window, strides, padding, hw):
    x = jax.random.normal(jax.random.PRNGKey(1), (3, *hw, 4), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2),
                          _xla_pool(x, window, strides, padding).shape,
                          jnp.float32)

    def loss_custom(x):
        return jnp.sum(pool.max_pool(x, window, strides, padding) * g)

    def loss_xla(x):
        return jnp.sum(_xla_pool(x, window, strides, padding) * g)

    dx_custom = jax.jit(jax.grad(loss_custom))(x)
    dx_xla = jax.jit(jax.grad(loss_xla))(x)
    # Elements that win SEVERAL overlapping windows sum their cotangents in
    # a different order than SelectAndScatter — identical routing, float
    # addition-order rounding only.
    np.testing.assert_allclose(np.asarray(dx_custom), np.asarray(dx_xla),
                               rtol=1e-6, atol=1e-6)


def test_tie_routing_matches_xla():
    """Quantized inputs force in-window ties: both paths must route each
    window's cotangent to the SAME single element (first maximum)."""
    key = jax.random.PRNGKey(3)
    x = jnp.round(jax.random.normal(key, (2, 16, 16, 3)) * 2) / 2
    window, strides, padding = (3, 3), (2, 2), ((1, 1), (1, 1))
    g = jnp.ones(_xla_pool(x, window, strides, padding).shape, jnp.float32)
    dx_custom = jax.grad(
        lambda x: jnp.sum(pool.max_pool(x, window, strides, padding) * g))(x)
    dx_xla = jax.grad(
        lambda x: jnp.sum(_xla_pool(x, window, strides, padding) * g))(x)
    # Sanity: ties actually occur (some window has >1 max candidate) and
    # the total routed mass equals the number of windows either way.
    assert float(jnp.sum(dx_custom)) == float(jnp.sum(g))
    np.testing.assert_array_equal(np.asarray(dx_custom), np.asarray(dx_xla))


def test_bf16_gradient_matches_xla():
    """bf16-quantized inputs produce REAL in-window ties; routing must be
    bit-identical (checked in f32 math), and the bf16 execution itself may
    differ only by bf16 addition-order rounding."""
    window, strides, padding = (3, 3), (2, 2), ((1, 1), (1, 1))
    xq = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 8),
                           jnp.float32).astype(jnp.bfloat16)
    gq = jax.random.normal(jax.random.PRNGKey(5),
                           _xla_pool(xq, window, strides, padding).shape,
                           jnp.float32).astype(jnp.bfloat16)

    # Exact routing identity on the quantized values, f32 accumulation.
    xf, gf = xq.astype(jnp.float32), gq.astype(jnp.float32)
    dx_custom = jax.grad(lambda x: jnp.sum(
        pool.max_pool(x, window, strides, padding) * gf))(xf)
    dx_xla = jax.grad(lambda x: jnp.sum(
        _xla_pool(x, window, strides, padding) * gf))(xf)
    np.testing.assert_array_equal(np.asarray(dx_custom), np.asarray(dx_xla))

    # bf16 execution: addition-order rounding only (~1 ulp of the summed
    # cotangent terms, |g| ~ N(0,1)).
    db_custom = jax.grad(lambda x: jnp.sum(
        (pool.max_pool(x, window, strides, padding) * gq)
        .astype(jnp.float32)))(xq)
    db_xla = jax.grad(lambda x: jnp.sum(
        (_xla_pool(x, window, strides, padding) * gq)
        .astype(jnp.float32)))(xq)
    np.testing.assert_allclose(np.asarray(db_custom, np.float32),
                               np.asarray(db_xla, np.float32),
                               rtol=0, atol=0.07)


@pytest.mark.parametrize('impl', ['xla', 'default'])
def test_env_fallback(monkeypatch, impl):
    if impl == 'default':
        monkeypatch.delenv('BIHOME_MAXPOOL_BWD', raising=False)
    else:
        monkeypatch.setenv('BIHOME_MAXPOOL_BWD', impl)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 2))
    out = pool.max_pool(x, (2, 2), (2, 2))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(_xla_pool(x, (2, 2), (2, 2),
                                              ((0, 0), (0, 0)))))
