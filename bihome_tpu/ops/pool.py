"""Max-pooling with an argmax-routed custom backward.

XLA differentiates ``lax.reduce_window``(max) through ``SelectAndScatter``,
whose TPU lowering runs at ~3x its bandwidth ceiling on the resnet stem
shapes (measured: nguyen bwd:maxpool 0.26 ms vs 0.08 ceiling; zhang stem
at 1.6x — see BENCH_NOTES round-4 roofline tables). The reference hits the
same op through torch ``F.max_pool2d`` backward (ref:
src/backbones/ResNet34.py:15-28 via torchvision resnet34, and the
Rethinking stem, ref: src/backbones/Rethinking.py:31-35).

This implementation keeps the XLA forward (reduce_window is optimal) and
replaces only the VJP:

  1. re-slice the padded input into its K = kh*kw strided tap views and
     compute a running first-maximum index — a [N,P,Q,C] int8 map of
     which window element won (first maximum, matching SelectAndScatter's
     first-match tie routing), kept in the natural NHWC layout;
  2. dx = sum over taps of interior-dilated ``dy * (idx == k)`` placed at
     the tap offset — pads, strided slices and elementwise selects only,
     which XLA fuses into one output pass (no scatter).

Traffic is x + dy + idx + dx (vs the scatter formulation's serialized
window walk). ``BIHOME_MAXPOOL_BWD=xla`` restores stock autodiff.
Exactness (including tie routing) is pinned by tests/test_pool.py.

NB: the env var is read at TRACE time (each ``max_pool`` call), and jit
caches are not keyed on it — set it before the first compile of a given
function; flipping it mid-process does not retrace already-compiled
callers. (Both paths are numerically equivalent, so a stale cache is a
perf setting, never a wrong gradient.)
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]


def _use_custom_bwd() -> bool:
    # Default 'xla' until the tap path is (re-)measured on the real chip:
    # the first tap formulation (stacked argmax) measured 0.66x END-TO-END
    # on zeng/zeng-orig training — layout, not semantics (see module note).
    # Flip per-run with BIHOME_MAXPOOL_BWD=taps; tests cover both.
    return os.environ.get('BIHOME_MAXPOOL_BWD', 'xla') == 'taps'


def _reduce_max(x, window, strides, padding: Pad2):
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        ((0, 0), padding[0], padding[1], (0, 0)))


def _tap_slices(xpad, out_hw, window, strides):
    """The K strided tap views of the padded input, each [N,P,Q,C]."""
    n, _, _, c = xpad.shape
    p, q = out_hw
    sh, sw = strides
    taps = []
    for a in range(window[0]):
        for b in range(window[1]):
            taps.append(lax.slice(
                xpad, (0, a, b, 0),
                (n, a + sh * (p - 1) + 1, b + sw * (q - 1) + 1, c),
                (1, sh, sw, 1)))
    return taps


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_taps(x, window, strides, padding: Pad2):
    return _reduce_max(x, window, strides, padding)


def _max_pool_fwd(x, window, strides, padding):
    return _reduce_max(x, window, strides, padding), x


def _max_pool_bwd(window, strides, padding, x, g):
    n, h, w, c = x.shape
    (pt, pb), (pl, pr) = padding
    sh, sw = strides
    p = (h + pt + pb - window[0]) // sh + 1
    q = (w + pl + pr - window[1]) // sw + 1
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xpad = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                   constant_values=neg)
    taps = _tap_slices(xpad, (p, q), window, strides)
    # First-maximum index per window (strict '>' keeps the earliest max ==
    # SelectAndScatter's first-match tie routing), computed as a running
    # max/index in the natural [N,P,Q,C] layout. NB: do NOT jnp.stack the
    # taps and argmax over a new minor axis — a size-K minormost dim pads
    # to the 128-lane tile on TPU (~14x relayout blowup; measured ~0.66x
    # end-to-end on zeng when this backward shipped stacked).
    best = taps[0]
    idx = jnp.zeros(best.shape, jnp.int8)
    for k in range(1, len(taps)):
        better = taps[k] > best
        best = jnp.where(better, taps[k], best)
        idx = jnp.where(better, jnp.int8(k), idx)
    hp, wp = h + pt + pb, w + pl + pr
    acc = None
    for k in range(window[0] * window[1]):
        a, b = divmod(k, window[1])
        term = jnp.where(idx == jnp.int8(k), g, jnp.zeros_like(g))
        # Interior-dilate to the stride grid and shift to the tap offset:
        # one lax.pad per tap, all fused into the dx output pass.
        d = lax.pad(term, jnp.zeros((), term.dtype),
                    ((0, 0, 0),
                     (a, hp - a - (sh * (p - 1) + 1), sh - 1),
                     (b, wp - b - (sw * (q - 1) + 1), sw - 1),
                     (0, 0, 0)))
        acc = d if acc is None else acc + d
    dx = lax.slice(acc, (0, pt, pl, 0), (n, pt + h, pl + w, c))
    return (dx,)


_max_pool_taps.defvjp(_max_pool_fwd, _max_pool_bwd)


def max_pool(x: jax.Array, window: Tuple[int, int],
             strides: Tuple[int, int],
             padding: Pad2 = ((0, 0), (0, 0))) -> jax.Array:
    """NHWC max-pool; forward == flax ``nn.max_pool`` with the same
    window/strides/padding, backward via the argmax-tap VJP above."""
    window = tuple(window)
    strides = tuple(strides)
    padding = (tuple(padding[0]), tuple(padding[1]))
    if not _use_custom_bwd():
        return _reduce_max(x, window, strides, padding)
    return _max_pool_taps(x, window, strides, padding)
