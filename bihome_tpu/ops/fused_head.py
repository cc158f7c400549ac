"""Fused Pallas kernel for the Rethinking PF head: 1x1 conv + BN + ReLU +
1x1 conv (ref: src/backbones/Rethinking.py:140-149).

Why: the reference head runs at FULL patch resolution (128x128) with a
128-channel middle, so the straightforward composition materializes a
[B*H*W, 128] activation in HBM three times per step (fwd write, bwd read,
weight-grad read) — profiled at ~7 ms/step on zeng-bihome (batch 64), all
bandwidth, ~10 TF/s effective. Both matmuls are tiny in FLOPs; the only way
to win is to never let the middle tensor touch HBM.

Approach:
  * Batch statistics WITHOUT materializing mid: mid = x @ w1 + b1 is affine
    in x, so E[mid] = E[x] @ w1 + b1 and E[mid^2]_c = w1_c^T (X^T X / M) w1_c
    + 2 b1_c (E[x] @ w1)_c + b1_c^2 — one [Cin, M] x [M, Cin] matmul over the
    input (read x once) gives exact batch mean/var.
  * One fused pass for the output: tiles of pixels live in LANES, channels
    in SUBLANES (transposed [C, M] layout — a [M, 16] pixel-major array
    would lane-pad 16 -> 128 and octuple HBM traffic). Per tile:
    mid = w1^T x -> BN affine -> ReLU -> w2^T r, all in VMEM.
  * Custom VJP with the same two-pass structure: pass C accumulates the
    BN reductions (sum da, sum da*n) + dw2/db2 while recomputing mid from
    x; pass D applies the full batch-stat backward
    dmid = gamma*is*(da - mean(da) - n*mean(da*n)) and produces dx/dw1/db1.

Semantics match the plain composition (nn.Conv 1x1 -> nn.BatchNorm ->
relu -> nn.Conv 1x1); the reference (non-Pallas) composition lives in
models/backbones.py and is used on non-TPU backends. Numerics note: TPU
matmuls at default precision round f32 operands through bf16 MXU passes,
and this kernel additionally folds the BN scale into w1, so fused-vs-plain
outputs differ at bf16-epsilon relative scale (measured ~2.5% max on
random inputs; ~1px on DSAC deltas after solve amplification) — both are
equally valid roundings of the same f32 math.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Lanes (pixels) per program. H*W = 128*128 = 16384 divides every real M;
# the wrapper pads otherwise. VMEM per program ~= 5 * Cmid * TP * 4 bytes
# and the scoped-vmem stack limit is 16MB.
_TP = 4096
_TP_WIDE = 1024   # for Cmid > 128 (ResNet50-flavor head, Cmid=512)


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _tp_for(cmid: int) -> int:
    return _TP if cmid <= 128 else _TP_WIDE


def batch_stats_affine(x2d: Array, w1: Array, b1: Array
                       ) -> Tuple[Array, Array]:
    """Exact batch mean/var of mid = x @ w1 + b1 without forming mid.

    x2d [M, Cin], w1 [Cin, Cmid], b1 [Cmid] -> (mean [Cmid], var [Cmid]).
    Biased variance (flax/torch BN normalization convention).
    """
    m = x2d.shape[0]
    w1f = w1.astype(jnp.float32)
    ex = jnp.mean(x2d.astype(jnp.float32), axis=0)             # [Cin]
    # Second moment of x, f32 accumulation on the MXU.
    s = jax.lax.dot_general(x2d, x2d, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / m
    mean_lin = ex @ w1f                                        # [Cmid]
    mean = mean_lin + b1
    # E[(x.w1_c)^2] = w1_c^T S w1_c
    e2_lin = jnp.sum(w1f * (s @ w1f), axis=0)                  # [Cmid]
    e_mid2 = e2_lin + 2.0 * b1 * mean_lin + b1 * b1
    var = jnp.maximum(e_mid2 - mean * mean, 0.0)
    return mean, var


def _col(v: Array) -> Array:
    return v.reshape(-1, 1).astype(jnp.float32)


def _fwd_kernel(x_ref, g1t_ref, c1_ref, w2_ref, b2_ref, out_ref):
    """out = w2^T relu(g1t @ x + c1) + b2, pixels in lanes.

    x [Cin, TP]; g1t [Cmid, Cin] (w1^T pre-scaled by gamma*is);
    c1 [Cmid, 1] (BN affine constant); w2 [Cmid, Cout]; b2 [Cout, 1].
    """
    x = x_ref[...]
    a = jax.lax.dot_general(g1t_ref[...], x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + c1_ref[...]
    r = jnp.maximum(a, 0.0).astype(x.dtype)
    out = jax.lax.dot_general(
        w2_ref[...].astype(x.dtype), r, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = out + b2_ref[...]


def _bwd_c_kernel_impl(x_ref, g_ref, w1t_ref, gis_ref, c1_ref, w2_ref,
                       sums_ref, dw2_ref, db2_ref):
    """Pass C: accumulate sum(da), sum(da*mid') [Cmid,2], dw2 [Cmid,Cout],
    db2 [Cout,1] while recomputing mid' = w1t @ x (bias-less pre-BN) and
    a = gis*mid' + c1. sum(da*n) is recovered on the XLA side as
    is*sum(da*mid') + is*(b1-mu)*sum(da) — no division by gamma, so the
    formulation stays exact even at gamma ~ 0."""
    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)                         # [Cout, TP]
    mid = jax.lax.dot_general(w1t_ref[...].astype(x.dtype), x,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    a = gis_ref[...] * mid + c1_ref[...]
    r = jnp.maximum(a, 0.0)
    # da = (w2 @ g) * (a > 0); Cout is tiny -> broadcast-mult instead of a
    # K=Cout MXU dot.
    w2 = w2_ref[...]                                           # [Cmid, Cout]
    cout = w2.shape[1]
    da = jnp.zeros_like(a)
    for co in range(cout):
        da = da + w2[:, co:co + 1] * g[co:co + 1, :]
    da = jnp.where(a > 0.0, da, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    sums = jnp.concatenate(
        [jnp.sum(da, axis=1, keepdims=True),
         jnp.sum(da * mid, axis=1, keepdims=True)], axis=1)    # [Cmid, 2]
    sums_ref[...] += sums
    dw2_ref[...] += jax.lax.dot_general(
        r.astype(x.dtype), g.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [Cmid, Cout]
    db2_ref[...] += jnp.sum(g, axis=1, keepdims=True)          # [Cout, 1]


def _bwd_d_kernel(x_ref, g_ref, w1t_ref, gis_ref, c1_ref, w2_ref, k1_ref,
                  k0_ref, w1_ref, dx_ref, dw1_ref, db1_ref):
    """Pass D: dmid = gis*da - k1*mid' + k0 -> dx (written per tile),
    dw1/db1 accumulated. k1/k0 carry the batch-stat correction terms
    (zero in eval mode)."""
    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    mid = jax.lax.dot_general(w1t_ref[...].astype(x.dtype), x,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    a = gis_ref[...] * mid + c1_ref[...]
    w2 = w2_ref[...]
    cout = w2.shape[1]
    da = jnp.zeros_like(a)
    for co in range(cout):
        da = da + w2[:, co:co + 1] * g[co:co + 1, :]
    da = jnp.where(a > 0.0, da, 0.0)
    dmid = gis_ref[...] * da - k1_ref[...] * mid + k0_ref[...]
    dmid_c = dmid.astype(x.dtype)
    dx_ref[...] = jax.lax.dot_general(
        w1_ref[...].astype(x.dtype), dmid_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    dw1_ref[...] += jax.lax.dot_general(
        x, dmid_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [Cin, Cmid]
    db1_ref[...] += jnp.sum(dmid, axis=1, keepdims=True)       # [Cmid, 1]


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _run_fwd(xt, w1, b1, gamma, beta, w2, b2, mu, var, eps):
    cin, m = xt.shape
    cmid = w1.shape[1]
    cout = w2.shape[1]
    tp = min(_tp_for(cmid), m)
    inv_s = jax.lax.rsqrt(var + eps)
    gis = (gamma * inv_s).astype(jnp.float32)
    # Fold BN into the first matmul: a = (w1^T * gis) x + c1.
    g1t = (w1.astype(jnp.float32) * gis[None, :]).T            # [Cmid, Cin]
    c1 = _col((b1 - mu) * gis + beta)
    nb = m // tp
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((cin, tp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _const_spec((cmid, cin)), _const_spec((cmid, 1)),
            _const_spec((cmid, cout)), _const_spec((cout, 1)),
        ],
        out_specs=pl.BlockSpec((cout, tp), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, m), jnp.float32),
        interpret=_interpret(),
    )(xt, g1t.astype(xt.dtype), c1, w2.astype(jnp.float32), _col(b2))
    return out


def _run_bwd(xt, gt, w1, b1, gamma, beta, w2, mu, var, eps, train_stats):
    cin, m = xt.shape
    cmid = w1.shape[1]
    cout = w2.shape[1]
    tp = min(_tp_for(cmid), m)
    nb = m // tp
    inv_s = jax.lax.rsqrt(var + eps)
    gis = gamma * inv_s
    cn = inv_s * (b1 - mu)
    c1 = gamma * cn + beta
    w1t = w1.T.astype(jnp.float32)                             # [Cmid, Cin]
    args = (xt, gt, w1t.astype(xt.dtype), _col(gis), _col(c1),
            w2.astype(jnp.float32))
    const_in = [_const_spec(s.shape) for s in args[2:]]
    x_spec = pl.BlockSpec((cin, tp), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((cout, tp), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    sums, dw2, db2 = pl.pallas_call(
        _bwd_c_kernel_impl,
        grid=(nb,),
        in_specs=[x_spec, g_spec] + const_in,
        out_specs=(_const_spec((cmid, 2)), _const_spec((cmid, cout)),
                   _const_spec((cout, 1))),
        out_shape=(jax.ShapeDtypeStruct((cmid, 2), jnp.float32),
                   jax.ShapeDtypeStruct((cmid, cout), jnp.float32),
                   jax.ShapeDtypeStruct((cout, 1), jnp.float32)),
        interpret=_interpret(),
    )(*args)

    sum_da = sums[:, 0]
    sum_dan = inv_s * sums[:, 1] + cn * sum_da         # sum(da * n), exact
    if train_stats:
        k1 = _col(gis * inv_s * (sum_dan / m))
        k0 = _col(-gis * (sum_da / m) - gis * (sum_dan / m) * cn)
    else:
        k1 = jnp.zeros((cmid, 1), jnp.float32)
        k0 = jnp.zeros((cmid, 1), jnp.float32)
    dx, dw1, db1 = pl.pallas_call(
        _bwd_d_kernel,
        grid=(nb,),
        in_specs=[x_spec, g_spec] + const_in + [
            _const_spec((cmid, 1)), _const_spec((cmid, 1)),
            _const_spec((cin, cmid))],
        out_specs=(x_spec, _const_spec((cin, cmid)),
                   _const_spec((cmid, 1))),
        out_shape=(jax.ShapeDtypeStruct((cin, m), xt.dtype),
                   jax.ShapeDtypeStruct((cin, cmid), jnp.float32),
                   jax.ShapeDtypeStruct((cmid, 1), jnp.float32)),
        interpret=_interpret(),
    )(*args, k1, k0, w1.astype(jnp.float32))
    # dgamma = sum(da*n), dbeta = sum(da)
    return dx, dw1, db1[:, 0], sum_dan, sum_da, dw2, db2[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_head(x2d, w1, b1, gamma, beta, w2, b2, mu, var, eps,
                train_stats):
    """x2d [M, Cin] -> [M, Cout]; mu/var are the normalization statistics
    (batch stats in train mode or running stats). They are array-valued, so
    they stay regular (differentiable-position) arguments with zero
    cotangents — the caller stop_gradients them, and pass C/D account for
    the stats' dependence on (x, w1, b1) analytically."""
    xt = x2d.T
    out = _run_fwd(xt, w1, b1, gamma, beta, w2, b2, mu, var, eps)
    return out.T.astype(x2d.dtype)


def _fused_head_fwd(x2d, w1, b1, gamma, beta, w2, b2, mu, var, eps,
                    train_stats):
    out = _fused_head(x2d, w1, b1, gamma, beta, w2, b2, mu, var, eps,
                      train_stats)
    return out, (x2d, w1, b1, gamma, beta, w2, b2, mu, var)


def _fused_head_bwd(eps, train_stats, res, g):
    x2d, w1, b1, gamma, beta, w2, b2, mu, var = res
    xt = x2d.T
    gt = g.T
    dx, dw1, db1, dgamma, dbeta, dw2, db2 = _run_bwd(
        xt, gt, w1, b1, gamma, beta, w2, mu, var, eps, train_stats)
    return (dx.T.astype(x2d.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype), jnp.zeros_like(mu), jnp.zeros_like(var))


_fused_head.defvjp(_fused_head_fwd, _fused_head_bwd)


def fused_pf_head(x: Array, w1: Array, b1: Array, gamma: Array, beta: Array,
                  w2: Array, b2: Array, running_mean: Array,
                  running_var: Array, train: bool, eps: float = 1e-5
                  ) -> Tuple[Array, Array, Array]:
    """Fused conv1x1+BN+ReLU+conv1x1 head on NHWC input.

    Returns (y [B,H,W,Cout], batch_mean, batch_var) in train mode (caller
    updates running stats with flax momentum), or (y, running_mean,
    running_var) in eval mode.
    """
    b, h, w, cin = x.shape
    m = b * h * w
    x2d = x.reshape(m, cin)
    w1m = w1.reshape(cin, -1)
    w2m = w2.reshape(w1m.shape[1], -1)
    if train:
        mu, var = batch_stats_affine(x2d, w1m.astype(jnp.float32),
                                     b1.astype(jnp.float32))
        # Statistics are treated as constants of the VJP; their dependence
        # on (x, w1, b1) is accounted for analytically in pass C/D.
        mu = jax.lax.stop_gradient(mu)
        var = jax.lax.stop_gradient(var)
    else:
        mu = running_mean.astype(jnp.float32)
        var = running_var.astype(jnp.float32)
    y = _fused_head(x2d, w1m, b1, gamma, beta, w2m, b2, mu, var,
                    float(eps), bool(train))
    return y.reshape(b, h, w, -1), mu, var
