"""Pretext distillation targets (tools/pretrain_aux.py) spec tests.

The flagship training demo rests on these target properties; lock them:
  * shapes: [B,32,32,64] at patch 128, values in (-1,1) via tanh,
  * grad targets respond to spatial content (non-constant),
  * gradpi targets are invariant to the brightness/contrast jitter family
    they are trained against (exactly: offsets die in Sobel, scales die in
    the per-sample normalization)."""

import numpy as np
import jax.numpy as jnp

import pytest

tools = pytest.importorskip('tools.pretrain_aux')


def _patches(b=2, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(b, 128, 128, 1).astype(np.float32)
    # Add smooth structure so gradients are non-trivial.
    yy, xx = np.mgrid[0:128, 0:128] / 128.0
    return jnp.asarray(base * 0.2 + np.sin(6 * xx + 4 * yy)[None, ..., None])


def test_grad_targets_shape_and_range():
    t = tools.grad_targets(_patches())
    assert t.shape == (2, 32, 32, 64)
    assert float(jnp.max(jnp.abs(t))) < 1.0
    assert float(jnp.std(t)) > 1e-3      # not collapsed


def test_gradpi_invariant_to_brightness_contrast():
    x = _patches()
    t0 = tools.grad_targets_pi(x)
    t1 = tools.grad_targets_pi(1.3 * (x + 0.4))
    # offsets cancel exactly (edge-replicate pads); contrast leaves only
    # the normalization-epsilon residual (~6e-4)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=0, atol=2e-3)
    # plain grad targets are NOT invariant (sanity of the distinction)
    g0, g1 = tools.grad_targets(x), tools.grad_targets(1.3 * (x + 0.4))
    assert float(jnp.max(jnp.abs(g0 - g1))) > 1e-2
