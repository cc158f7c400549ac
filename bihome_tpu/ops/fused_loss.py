"""Fused triplet distance/mask-norm chain (biHomE + CA-UDHN loss tails).

The flagship biHomE loss tail (heads/assembled.py `_triplet_resnet_loss`,
ref: src/heads/PerceptualHead.py:540-665) and the zhang TripletHead tail
(`_triplet_head_forward`, ref: src/heads/TripletHead.py:77-153) share one
structure over [B,h,w,C] feature maps:

    l1 = |f1' - f2|,  l2 = |f2' - f1|,  l3 = |f1 - f2|
    lm_i = hinge-aggregate(l_i, l3, margin, aggregation)      # [B,h,w]
    ln_i = sum_b sum_pix(w_i * lm_i) / max(sum_pix w_i, 1)

plus five full-map metric means. Left to XLA autodiff this lowers to
~20+ reduce/elementwise kernels whose cost on this runtime is the
~40-60 us/op launch floor, not bandwidth (the perfect-fusion floor is
~0.16 ms vs ~1.2 ms measured on zeng — BENCH_NOTES round-5). This module
fuses the whole chain into ONE custom-vjp op: the forward emits every
reduce from a single traversal, and the hand-written backward
rematerializes the hinge masks from the saved (bf16) features in the
same fusion that writes the feature cotangents.

Semantics notes (all pinned by tests/test_fused_loss.py against the
unfused chain):
  * distance 'l1' only (the only channel-resolved distance either tail
    uses; 'l2'/'cosine' configs fall back to the open-coded chain).
  * margin: float, or the string 'inf' (no hinge). With
    ``second_scale=True`` a channel-agnostic float margin applies the
    reference's margin*C quirk to the SECOND direction only
    (ref: PerceptualHead.py:647-649); TripletHead passes False
    (both directions use the plain margin, ref: TripletHead.py:86-100).
  * ``plain_grad=False`` treats f_plain = [f1; f2] as a constant (the
    biHomE caller computes it under stop_gradient, assembled.py) and
    the backward skips its cotangent entirely. TripletHead's features
    are LEARNED (the backbone's FeatureExtractor), so it passes True
    and the backward emits the full d_f1/d_f2 terms.
  * metric outputs are non-differentiable (stop_gradient'd on return).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def use_fused_loss() -> bool:
    """Trace-time switch; BIHOME_LOSS_FUSE=off restores the open-coded
    chain (same math, XLA autodiff)."""
    return os.environ.get('BIHOME_LOSS_FUSE', 'on') != 'off'


def _hinge_aggregate(l_pos, l_anchor, margin, aggregation, second):
    """Channel aggregation + hinge -> [B,h,w] loss mat. Mirrors
    heads/assembled.py `_triplet_margin_aggregate` for channel-resolved
    (4D) distances."""
    if isinstance(margin, str):                       # 'inf': no hinge
        return jnp.sum(l_pos - l_anchor, axis=-1)
    if aggregation == 'channel-aware':
        return jnp.sum(jnp.maximum(l_pos - l_anchor + margin, 0.0), axis=-1)
    if aggregation == 'channel-agnostic':
        eff = margin * l_pos.shape[-1] if second else margin
        return jnp.maximum(jnp.sum(l_pos, axis=-1)
                           - jnp.sum(l_anchor, axis=-1) + eff, 0.0)
    raise ValueError(aggregation)


def _forward(fp_w, f_plain, w1, w2, margin, aggregation, second_scale):
    """Single-traversal forward. fp_w = [2B,...] stack of (f1', f2'),
    f_plain = [2B,...] stack of (f1, f2); w1/w2 = [B,h,w] mask products."""
    f32 = jnp.float32
    b = fp_w.shape[0] // 2
    f1p, f2p = fp_w[:b].astype(f32), fp_w[b:].astype(f32)
    f1, f2 = f_plain[:b].astype(f32), f_plain[b:].astype(f32)
    w1 = w1.astype(f32)
    w2 = w2.astype(f32)

    l1 = jnp.abs(f1p - f2)
    l2 = jnp.abs(f2p - f1)
    l3 = jnp.abs(f1 - f2)
    lm1 = _hinge_aggregate(l1, l3, margin, aggregation, second=False)
    lm2 = _hinge_aggregate(l2, l3, margin, aggregation,
                           second=second_scale)

    den1 = jnp.sum(w1, axis=(-2, -1))
    den2 = jnp.sum(w2, axis=(-2, -1))
    den1e = jnp.maximum(den1, 1.0)
    den2e = jnp.maximum(den2, 1.0)
    ln1_b = jnp.sum(w1 * lm1, axis=(-2, -1)) / den1e
    ln2_b = jnp.sum(w2 * lm2, axis=(-2, -1)) / den2e
    ln1 = jnp.sum(ln1_b)
    ln2 = jnp.sum(ln2_b)

    metrics = (jnp.mean(l1),            # loss_comp/l1 = mean|f2 - f1'|
               jnp.mean(l2),            # loss_comp/l2 = mean|f1 - f2'|
               jnp.mean(l3),            # loss_comp/l3 = mean|f2 - f1|
               jnp.mean(f1), jnp.mean(f2), jnp.mean(f1p),
               jnp.min(den1), jnp.min(den2))
    return (ln1, ln2, metrics), (ln1_b, ln2_b, den1, den2)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def triplet_double_line(fp_w: Array, f_plain: Array, w1: Array, w2: Array,
                        margin, aggregation: str, second_scale: bool = True,
                        plain_grad: bool = False
                        ) -> Tuple[Array, Array, Tuple[Array, ...]]:
    """-> (ln1, ln2, metrics). See module docstring. metrics =
    (mean l1, mean l2, mean l3, mean f1, mean f2, mean f1', min den1,
    min den2), all non-differentiable."""
    out, _ = _forward(fp_w, f_plain, w1, w2, margin, aggregation,
                      second_scale)
    ln1, ln2, metrics = out
    return ln1, ln2, jax.lax.stop_gradient(metrics)


def _fwd(fp_w, f_plain, w1, w2, margin, aggregation, second_scale,
         plain_grad):
    out, aux = _forward(fp_w, f_plain, w1, w2, margin, aggregation,
                        second_scale)
    ln1, ln2, metrics = out
    res = (fp_w, f_plain, w1, w2, aux)
    return (ln1, ln2, jax.lax.stop_gradient(metrics)), res


def _bwd(margin, aggregation, second_scale, plain_grad, res, g):
    g1, g2, _ = g                      # metric cotangents are zero by spec
    fp_w, f_plain, w1, w2, (ln1_b, ln2_b, den1, den2) = res
    f32 = jnp.float32
    b = fp_w.shape[0] // 2
    f1p, f2p = fp_w[:b].astype(f32), fp_w[b:].astype(f32)
    f1, f2 = f_plain[:b].astype(f32), f_plain[b:].astype(f32)
    w1f = w1.astype(f32)
    w2f = w2.astype(f32)
    den1e = jnp.maximum(den1, 1.0)
    den2e = jnp.maximum(den2, 1.0)

    e1 = f1p - f2
    e2 = f2p - f1
    e3 = f1 - f2
    l3 = jnp.abs(e3)

    def direction(e, second):
        """-> (hinge mask H broadcastable to [.,h,w,C], lm [B,h,w])."""
        l_pos = jnp.abs(e)
        if isinstance(margin, str):
            h = jnp.ones((), f32)
            lm = jnp.sum(l_pos - l3, axis=-1)
        elif aggregation == 'channel-aware':
            t = l_pos - l3 + margin
            h = (t > 0).astype(f32)
            lm = jnp.sum(jnp.maximum(t, 0.0), axis=-1)
        else:                                        # channel-agnostic
            eff = margin * e.shape[-1] if second else margin
            t = (jnp.sum(l_pos, axis=-1) - jnp.sum(l3, axis=-1) + eff)
            h = (t > 0).astype(f32)[..., None]
            lm = jnp.maximum(t, 0.0)
        return h, lm

    h1, lm1 = direction(e1, second=False)
    h2, lm2 = direction(e2, second=second_scale)

    a1 = (g1 * w1f / den1e[:, None, None])[..., None]     # [B,h,w,1]
    a2 = (g2 * w2f / den2e[:, None, None])[..., None]
    s1 = jnp.sign(e1)
    s2 = jnp.sign(e2)
    d_f1p = a1 * h1 * s1
    d_f2p = a2 * h2 * s2
    d_fp = jnp.concatenate([d_f1p, d_f2p], axis=0).astype(fp_w.dtype)

    if plain_grad:
        # l3 = |f1 - f2| enters BOTH hinge terms with negative sign and
        # l2 = |f2' - f1| carries f1 directly:
        #   d lm1/d f1 = -H1 s3 ;        d lm1/d f2 = H1 (s3 - s1)
        #   d lm2/d f1 = -H2 (s2 + s3) ; d lm2/d f2 = H2 s3
        s3 = jnp.sign(e3)
        d_f1 = -a1 * h1 * s3 - a2 * h2 * (s2 + s3)
        d_f2 = a1 * h1 * (s3 - s1) + a2 * h2 * s3
        d_plain = jnp.concatenate([d_f1, d_f2], axis=0).astype(
            f_plain.dtype)
    else:
        d_plain = jnp.zeros_like(f_plain)

    # d/dw of sum(w*lm)/max(sum w, 1): the den term only flows when the
    # clamp is inactive (jnp.maximum subgradient at den > 1).
    live1 = (den1 > 1.0).astype(f32)
    live2 = (den2 > 1.0).astype(f32)
    d_w1 = (g1 * (lm1 - (ln1_b * live1)[:, None, None])
            / den1e[:, None, None]).astype(w1.dtype)
    d_w2 = (g2 * (lm2 - (ln2_b * live2)[:, None, None])
            / den2e[:, None, None]).astype(w2.dtype)

    return d_fp, d_plain, d_w1, d_w2


triplet_double_line.defvjp(_fwd, _bwd)

# Backwards-compatible alias for the biHomE call site.
bihome_double_line = triplet_double_line
