"""ConvTranspose 2x2/stride-2 with a matmul-shaped custom backward.

The Rethinking decoder's upsampling blocks (ref: src/backbones/utils.py:60-82)
use kernel-2 stride-2 transposed convs, whose output phases never overlap.
XLA's autodiff of ``lax.conv_transpose`` lowers the data gradient through
spatial reverses of the FULL-RESOLUTION cotangent plus dilated convolutions
(profiled ~0.9 ms/step of reverses alone on zeng-bihome), and the weight
gradient through a low-MFU conv emitter. Because phases are disjoint, both
gradients are exactly dense matmuls over a phase-split view:

    y[b, 2i+p, 2j+q, o] = sum_c x[b,i,j,c] . K[p,q,o,c]     (fwd, XLA's own
                                                             lowering is kept)
    dx[b,i,j,c] = sum_{p,q,o} g_r[b,i,p,j,q,o] . K[p,q,o,c]  == [M,4Co]x[4Co,C]
    dK[p,q,o,c] = sum_{b,i,j} g_r[b,i,p,j,q,o] . x[b,i,j,c]  == [4Co,M]x[M,C]

with g_r = g.reshape(B, H, 2, W, 2, Co) — a free reshape, no strided slices,
no reverses, and the wgrad contracts the huge M axis on the MXU.

Parameter names/shapes are identical to flax ``nn.ConvTranspose(features,
(2,2), strides=(2,2), padding='VALID', transpose_kernel=True)`` so
checkpoints and torch ports are unaffected. BIHOME_CT_BWD=xla restores the
stock autodiff path.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import initializers


def _use_custom_bwd() -> bool:
    return os.environ.get('BIHOME_CT_BWD', 'phase') != 'xla'


def _fwd(x, kernel):
    return jax.lax.conv_transpose(
        x, kernel, strides=(2, 2), padding='VALID',
        transpose_kernel=True,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@jax.custom_vjp
def _ct2x2(x, kernel):
    return _fwd(x, kernel)


def _ct2x2_fwd(x, kernel):
    return _fwd(x, kernel), (x, kernel)


def _ct2x2_bwd(res, g):
    x, kernel = res
    b, h, w, cin = x.shape
    co = kernel.shape[2]
    g_r = g.reshape(b, h, 2, w, 2, co)
    kf = kernel.astype(g.dtype)
    dx = jnp.einsum('bipjqo,pqoc->bijc', g_r, kf,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    dk = jnp.einsum('bipjqo,bijc->pqoc', g_r, x.astype(g.dtype),
                    preferred_element_type=jnp.float32).astype(kernel.dtype)
    return dx, dk


_ct2x2.defvjp(_ct2x2_fwd, _ct2x2_bwd)


class ConvTranspose2x2(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (2,2), strides=(2,2),
    padding='VALID', transpose_kernel=True) with the phase-matmul VJP."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param('kernel', initializers.lecun_normal(),
                            (2, 2, self.features, cin), jnp.float32)
        bias = (self.param('bias', initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        y = _ct2x2(x, kernel) if _use_custom_bwd() else _fwd(x, kernel)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
