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
from functools import partial
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


def compose_deconv2x2_conv3x3(wd: jax.Array, w1: jax.Array) -> jax.Array:
    """Composite phase kernels for conv3x3(SAME)(ConvTranspose2x2(x; wd)).

    A k2/s2 transposed conv followed by a 3x3 conv is a single k4/s2
    transposed conv; phase-decomposed, each of the 4 output phases
    (alpha, beta) is a plain conv2x2 over x with a composite kernel

        K_ab[r,s,ci,co] = sum_{(a,di) in P[alpha][r]} sum_{(b,dj) in P[beta][s]}
                          sum_m wd[di,dj,m,ci] . w1[a,b,m,co]

    where P[alpha][r] enumerates which conv3x3 tap ``a`` hits which deconv
    phase ``di`` inside the 2-row x window of that output phase. All four
    phases stack to ONE [2,2,Cin,4*Cout] kernel — full 128-lane MXU
    utilization (K=4*Cin, N=4*Cout) where the literal composition runs a
    lane-starved Cout-wide conv3x3 over the 2x-upsampled intermediate and
    round-trips that [N,2H,2W,C] tensor through HBM
    (ref: src/backbones/utils.py:60-82 runs them as two stock torch ops).

    wd: [2,2,Cmid,Cin] (ConvTranspose2x2 layout), w1: [3,3,Cmid,Cout]
    -> [2,2,Cin,4*Cout] (phase-major output blocks, alpha*2+beta).
    """
    f32 = jnp.float32
    # t[a, di, b, dj, ci, co]
    t = jnp.einsum('demc,abmo->adbeco', wd.astype(f32), w1.astype(f32))
    # P[alpha][r] -> valid (conv3x3 tap index a, deconv phase di) pairs for
    # x-window row r of output phase alpha (window offset: -1 for alpha=0,
    # 0 for alpha=1). Derivation: u0 row 2(i+off+r)+di == 2i+alpha+(a-1).
    pairs = ((((0, 1),), ((1, 0), (2, 1))),
             (((0, 0), (1, 1)), ((2, 0),)))
    blocks = []
    for alpha in (0, 1):
        for beta in (0, 1):
            rows = []
            for rp in (0, 1):
                cols = []
                for sp in (0, 1):
                    acc = None
                    for a, di in pairs[alpha][rp]:
                        for b, dj in pairs[beta][sp]:
                            term = t[a, di, b, dj]
                            acc = term if acc is None else acc + term
                    cols.append(acc)
                rows.append(jnp.stack(cols, 0))
            blocks.append(jnp.stack(rows, 0))                # [2,2,ci,co]
    return jnp.concatenate(blocks, axis=-1)                  # [2,2,ci,4co]


# u-index (K4 tap) -> (phase alpha, window row r): derived from
# y[2i'+alpha] += x[i'+o_a+r] . K_ab[r,s] with o = (-1, 0).
_K4_IDX = ((1, 1), (0, 1), (1, 0), (0, 0))


def _k4_from_kfull(kfull, cin, co):
    """Reindex the [2,2,Cin,4*Cout] phase kernel as the equivalent k4/s2
    transposed-conv kernel K4[u,v,ci,co] (y[p] = sum_i x[i].K4[p-2i+1])."""
    km = kfull.reshape(2, 2, cin, 4, co)
    return jnp.stack([
        jnp.stack([km[r, s, :, 2 * a + b, :]
                   for (b, s) in _K4_IDX], axis=0)
        for (a, r) in _K4_IDX], axis=0)                      # [4,4,ci,co]


def _pca_impl(x, kfull):
    """Forward, BIHOME_DC_FWD selects the formulation:
      'ct' (default): one input-dilated conv with the reversed K4 kernel —
        writes y directly in NHWC, no phase-assembly permute. Measured
        best end-to-end (zeng 2,104 pairs/s vs 2,004 unfused baseline;
        the TPU conv emitter skips the dilation zeros).
      'phase': conv2x2(pad 1) over x + phase re-assembly (lane-full MXU,
        but the assembly is a full-res HBM permute — measured 1,903).
    """
    n, h, w, cin = x.shape
    cout = kfull.shape[-1] // 4
    if os.environ.get('BIHOME_DC_FWD', 'ct') == 'ct':
        k4 = _k4_from_kfull(kfull, cin, cout)[::-1, ::-1]
        return jax.lax.conv_general_dilated(
            x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = jax.lax.conv_general_dilated(
        x, kfull, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    p00 = out[:, :h, :w, :cout]
    p01 = out[:, :h, 1:, cout:2 * cout]
    p10 = out[:, 1:, :w, 2 * cout:3 * cout]
    p11 = out[:, 1:, 1:, 3 * cout:]
    ph = jnp.stack([p00, p01, p10, p11], axis=3)             # [n,h,w,4,co]
    y = ph.reshape(n, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, cout)


@jax.custom_vjp
def _phase_conv_assemble(x, kfull):
    return _pca_impl(x, kfull)


def _pca_fwd(x, kfull):
    return _pca_impl(x, kfull), (x, kfull)


def _pca_bwd(res, g):
    """No-reverse, op-lean backward. XLA's autodiff of the phase-conv
    graph emits full-res spatial reverses of the cotangent plus a padded
    [n,h+1,w+1,4co] scatter-accumulate (measured: bwd:layer7_deconv
    3.43 -> 6.57 ms on zeng); a 16-dot phase wgrad fixes the traffic but
    drowns in the ~45us/op launch floor (65 ops, 3.87 ms). Three ops:

      dgrad: the composition is a k4/s2 transposed conv, so dx is ONE
      stride-2 kernel-4 conv of dy with the trace-time-reindexed kernel
      — reads dy once, no reverses, no padded buffer.
      wgrad: ONE batch-contracting conv (lhs=pad(dy) spec CHWN, rhs=x
      spec IHWO, rhs_dilation 2): dK4[u,v,ci,co] =
      sum_{n,i,j} x[n,i,j,ci] . dy[n,2i-1+u,2j-1+v,co], then the tiny
      inverse phase reindex back to the [2,2,Cin,4Cout] layout.
    """
    x, kfull = res
    n, h, w, cin = x.shape
    co = g.shape[-1]
    k4 = _k4_from_kfull(kfull, cin, co)
    dx = jax.lax.conv_general_dilated(
        g, k4.transpose(0, 1, 3, 2), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)

    g_pad = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dk4 = jax.lax.conv_general_dilated(
        g_pad, x, (1, 1), 'VALID', rhs_dilation=(2, 2),
        dimension_numbers=('CHWN', 'IHWO', 'NHWC'),
        preferred_element_type=jnp.float32)                  # [co,4,4,ci]
    dk4 = dk4.transpose(1, 2, 3, 0)                          # [4,4,ci,co]
    # inverse reindex: K4[u,v] -> K_ab[r,s] channel blocks of kfull
    u_of = {ar: u for u, ar in enumerate(_K4_IDX)}
    dk = jnp.stack([
        jnp.stack([
            jnp.concatenate([dk4[u_of[(a, r)], u_of[(b, s)]]
                             for a in (0, 1) for b in (0, 1)], axis=-1)
            for s in (0, 1)], axis=0)
        for r in (0, 1)], axis=0)                            # [2,2,ci,4co]
    return dx, dk.astype(kfull.dtype)


_phase_conv_assemble.defvjp(_pca_fwd, _pca_bwd)


def _deconv_bias_field(w1: jax.Array, bd: jax.Array, h: int,
                       w: int) -> jax.Array:
    """Closed-form deconv-bias contribution to conv3x3(deconv(x)+bd):
    sum over valid conv3x3 taps of w1.bd per output pixel — constant in
    the interior, border-corrected via separable tap masks. [2h,2w,Cout]."""
    tb = jnp.einsum('abmo,m->abo', w1.astype(jnp.float32),
                    bd.astype(jnp.float32))
    taps = jnp.arange(3)

    def tap_mask(size):
        pos = jnp.arange(2 * size)[:, None] + taps[None, :] - 1
        return ((pos >= 0) & (pos < 2 * size)).astype(jnp.float32)

    return jnp.einsum('pa,qb,abo->pqo', tap_mask(h), tap_mask(w), tb)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _pcbr(x, kfull, v, gamma, beta, eps):
    """phase-conv + bias field + train-mode BatchNorm + ReLU, one op.

    -> (y, mu, var): mu/var are the BATCH statistics (f32, for the
    caller's running-average update; stop_gradient'd — the normalize
    path's dependence on them is handled inside the backward).

    The custom VJP saves the NORMALIZED activation z_hat (same size as
    the raw z stock autodiff saves — reconstructing it from the block
    output is impossible: the BN batch-stat feedback term z_hat*S2/M is
    dense over ALL elements, including ReLU-clipped ones where the
    output carries no information; measured r5, see BENCH_NOTES) and
    hand-writes the backward as exactly TWO full-res passes: one
    multi-output reduce for (S1, S2) and one pass emitting dz — where
    stock autodiff spends ~3-4 (relu mask, stat reduces re-reading z,
    normalize-recompute, combine). The three-term train-mode BN
    gradient (through mu and var) is exact.
    """
    return _pcbr_fwd(x, kfull, v, gamma, beta, eps)[0]


def _pcbr_impl(x, kfull, v, gamma, beta, eps):
    z = _pca_impl(x, kfull)
    z = z + v.astype(z.dtype)[None]
    zf32 = z.astype(jnp.float32)
    mu = jnp.mean(zf32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(zf32), axis=(0, 1, 2)) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    z_hat = (zf32 - mu) * inv
    a = z_hat * gamma + beta
    y = jnp.maximum(a, 0.0).astype(z.dtype)
    return y, mu, var, inv, z_hat


def _pcbr_fwd(x, kfull, v, gamma, beta, eps):
    y, mu, var, inv, z_hat = _pcbr_impl(x, kfull, v, gamma, beta, eps)
    out = (y, jax.lax.stop_gradient(mu), jax.lax.stop_gradient(var))
    return out, (x, kfull, y, z_hat.astype(y.dtype), gamma, inv)


def _pcbr_bwd(eps, res, g):
    gy, _, _ = g                     # mu/var outputs are non-differentiable
    x, kfull, y, z_hat, gamma, inv = res
    f32 = jnp.float32
    z_hat = z_hat.astype(f32)
    da = jnp.where(y > 0, gy.astype(f32), 0.0)
    m = float(y.shape[0] * y.shape[1] * y.shape[2])
    s1 = jnp.sum(da, axis=(0, 1, 2))
    s2 = jnp.sum(da * z_hat, axis=(0, 1, 2))
    dz = ((gamma * inv) * (da - s1 / m - z_hat * (s2 / m))).astype(x.dtype)
    dx, dkfull = _pca_bwd((x, kfull), dz)
    dv = jnp.sum(dz, axis=0).astype(f32)
    return dx, dkfull, dv, s2, s1


_pcbr.defvjp(_pcbr_fwd, _pcbr_bwd)


def fused_deconv_conv3x3_bn_relu(x: jax.Array, wd: jax.Array,
                                 bd: jax.Array, w1: jax.Array,
                                 gamma: jax.Array, beta: jax.Array,
                                 ra_mean: jax.Array, ra_var: jax.Array,
                                 train: bool, eps: float = 1e-5,
                                 dtype=jnp.float32):
    """relu(BN(conv3x3(SAME)(ConvTranspose2x2(x; wd, bd); w1))) without
    materializing either the upsampled intermediate or (in training) the
    pre-BN activation z for the backward — see ``_pcbr``.

    -> (y, mu, var): batch stats in train mode, running stats in eval
    (caller updates its running-average variables from mu/var exactly
    like flax ``nn.BatchNorm``)."""
    n, h, w, _ = x.shape
    kfull = compose_deconv2x2_conv3x3(wd, w1).astype(dtype)
    v = _deconv_bias_field(w1, bd, h, w)
    xc = x.astype(dtype)
    if train:
        y, mu, var = _pcbr(xc, kfull, v, gamma, beta, eps)
        return y, mu, var
    z = _pca_impl(xc, kfull) + v.astype(dtype)[None]
    inv = jax.lax.rsqrt(ra_var + eps)
    a = (z.astype(jnp.float32) - ra_mean) * (inv * gamma) + beta
    return jnp.maximum(a, 0.0).astype(dtype), ra_mean, ra_var


def fused_deconv_conv3x3(x: jax.Array, wd: jax.Array, bd: jax.Array,
                         w1: jax.Array, dtype=jnp.float32) -> jax.Array:
    """conv3x3(SAME, no bias)(bias + ConvTranspose2x2(x; wd)) without ever
    materializing the 2x-upsampled intermediate.

    One conv2x2 (padding 1) with the composite [2,2,Cin,4*Cout] kernel,
    phase re-assembly (free reshape/transpose), plus the closed-form
    deconv-bias field: the bias contributes sum_{valid taps} w1.bd per
    output pixel, which deviates from the interior constant only on the
    1-px border where conv3x3 taps fall outside the u0 frame — a tiny
    separable [2H,3]x[2W,3]x[3,3,Cout] einsum, exact at every pixel.

    x: [N,H,W,Cin] -> [N,2H,2W,Cout]. Exact reparameterization of the
    two-op composition (identical params; see compose_deconv2x2_conv3x3).
    """
    n, h, w, _ = x.shape
    kfull = compose_deconv2x2_conv3x3(wd, w1).astype(dtype)
    impl = (_pca_impl if os.environ.get('BIHOME_DC_BWD') == 'xla'
            else _phase_conv_assemble)
    y = impl(x.astype(dtype), kfull)
    v = _deconv_bias_field(w1, bd, h, w)
    return y + v.astype(y.dtype)[None]


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
