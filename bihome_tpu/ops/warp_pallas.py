"""Fused Pallas TPU kernel for bilinear (tent) sampling.

The XLA formulation of the MXU tent warp (geometry.tent_sample) materializes
a [P,W,C] intermediate in HBM per image (~2GB per biHomE step at batch 64,
profiled as the dominant bandwidth cost). This kernel fuses tent-weight
generation with both contractions in VMEM:

  out[p,c] = Σ_h relu(1-|v_p-h|) · Σ_w relu(1-|u_p-w|) · img[h,w,c]

Layouts (Mosaic tiling constraints: last two block dims must be divisible by
(8,128) or equal the array dims; reshapes across the sublane/lane boundary
are unsupported):
  * images are channel-major [N,C,H,W] so VMEM tiles land on (H,W) — an
    NHWC block with C∈{1,2,3} would lane-pad C to 128 and blow VMEM;
  * sample points/cotangents/outputs are [N, P/TP, TP, {1,C}] so each
    program sees natural 2D [TP, ·] tiles.

Forward grid: (N, P/TP); each program holds one full image (≤ 240·320·C
floats, well under VMEM) and a TP-point block of sample coordinates.

Custom VJP: the framework only ever consumes du/dv cotangents (gradients
flow into the predicted delta, never into the sampled image — patches are
data); d_image is a separate accumulating kernel that XLA DCEs when unused.

Numerics match geometry.bilinear_sample / tent_sample exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TP = 2048      # fwd points-per-program (VMEM-bounded for 320-wide srcs)
_TP_BWD = 1024  # bwd holds ~2x the weight tensors; stay under VMEM


def _interpret() -> bool:
    # pallas_call on the CPU backend only works in interpreter mode; the
    # compiled path is TPU-only.
    return jax.default_backend() != 'tpu'


def _weights(coord_col, size, tp):
    """coord_col [TP,1] -> (tent weights [TP,size], signed distance)."""
    grid = jax.lax.broadcasted_iota(jnp.int32, (tp, size), 1).astype(
        jnp.float32)
    d = coord_col - grid
    return jnp.maximum(0.0, 1.0 - jnp.abs(d)), d


def _fwd_kernel(img_ref, u_ref, v_ref, out_ref):
    img = img_ref[0]                                        # [C,H,W]
    u = u_ref[0, 0]                                         # [TP,1]
    v = v_ref[0, 0]
    c, h, w = img.shape
    tp = u.shape[0]
    wy, _ = _weights(v, h, tp)                              # [TP,H]
    wx, _ = _weights(u, w, tp)                              # [TP,W]
    # bf16 images: bf16xbf16 dots run in one MXU pass (f32 needs 3);
    # accumulation stays f32. Tent weights are exact in bf16 only up to
    # 8 mantissa bits — acceptable in bf16 compute mode.
    wy = wy.astype(img.dtype)
    outs = []
    for ci in range(c):
        tmp = jnp.dot(wy, img[ci],
                      preferred_element_type=jnp.float32)   # [TP,W]
        outs.append(jnp.sum(tmp * wx, axis=1, keepdims=True))
    out_ref[0, 0] = jnp.concatenate(outs, axis=1)           # [TP,C]


def _bwd_uv_kernel(img_ref, u_ref, v_ref, g_ref, du_ref, dv_ref):
    img = img_ref[0]                                        # [C,H,W]
    u = u_ref[0, 0]                                         # [TP,1]
    v = v_ref[0, 0]
    g = g_ref[0, 0]                                         # [TP,C]
    c, h, w = img.shape
    tp = u.shape[0]
    wy, dy = _weights(v, h, tp)
    wx, dx = _weights(u, w, tp)
    # d tent(d)/dd = -sign(d) on |d|<1 (zero elsewhere, a.e.)
    dwy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
    dwx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0)
    du = jnp.zeros((tp, 1), jnp.float32)
    dv = jnp.zeros((tp, 1), jnp.float32)
    for ci in range(c):
        gc = g[:, ci:ci + 1]                                # [TP,1]
        tmp_h = jnp.dot(wy, img[ci],
                        preferred_element_type=jnp.float32)  # [TP,W]
        du = du + jnp.sum(dwx * tmp_h, axis=1, keepdims=True) * gc
        tmp_w = jnp.dot(wx, img[ci].T,
                        preferred_element_type=jnp.float32)  # [TP,H]
        dv = dv + jnp.sum(dwy * tmp_w, axis=1, keepdims=True) * gc
    du_ref[0, 0] = du
    dv_ref[0, 0] = dv


def _bwd_img_kernel(u_ref, v_ref, g_ref, dimg_ref):
    u = u_ref[0, 0]                                         # [TP,1]
    v = v_ref[0, 0]
    g = g_ref[0, 0]                                         # [TP,C]
    _, c, h, w = dimg_ref.shape
    tp = u.shape[0]
    wy, _ = _weights(v, h, tp)
    wx, _ = _weights(u, w, tp)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros((c, h, w), jnp.float32)

    for ci in range(c):
        # dimg[h,w] += Σ_p wy[p,h]·wx[p,w]·g[p]
        acc = jnp.dot(wy.T, wx * g[:, ci:ci + 1],
                      preferred_element_type=jnp.float32)   # [H,W]
        dimg_ref[0, ci] = dimg_ref[0, ci] + acc


def _pad_blocked(x: Array, fill: float, tp: int) -> Array:
    """[N,P] -> [N, PP/tp, tp, 1] padded to a tp multiple."""
    n, p = x.shape
    pad = (-p) % tp
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
    return x.reshape(n, -1, tp, 1)


@jax.custom_vjp
def _tent_chw(image: Array, u: Array, v: Array) -> Array:
    """image [N,C,H,W] f32, u/v [N,P] f32 -> [N,P,C] f32."""
    return _forward(image, u, v)


def _point_specs(c, tp):
    point = pl.BlockSpec((1, 1, tp, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, 1, tp, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return point, chan


def _forward(image: Array, u: Array, v: Array) -> Array:
    n, c, h, w = image.shape
    p = u.shape[-1]
    # Pad with -2.0: all tent weights vanish, gradients zero.
    u4 = _pad_blocked(u, -2.0, _TP)
    v4 = _pad_blocked(v, -2.0, _TP)
    nblocks = u4.shape[1]
    point, chan = _point_specs(c, _TP)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n, nblocks),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            point, point,
        ],
        out_specs=chan,
        out_shape=jax.ShapeDtypeStruct((n, nblocks, _TP, c), jnp.float32),
        interpret=_interpret(),
    )(image, u4, v4)
    return out.reshape(n, nblocks * _TP, c)[:, :p]


def _fwd_rule(image, u, v):
    return _forward(image, u, v), (image, u, v)


def _bwd_rule(residuals, g):
    image, u, v = residuals
    n, c, h, w = image.shape
    p = u.shape[-1]
    u4 = _pad_blocked(u, -2.0, _TP_BWD)
    v4 = _pad_blocked(v, -2.0, _TP_BWD)
    nblocks = u4.shape[1]
    pad = nblocks * _TP_BWD - p
    g4 = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, pad), (0, 0))).reshape(n, nblocks, _TP_BWD, c)
    point, chan = _point_specs(c, _TP_BWD)
    img_spec = pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    du, dv = pl.pallas_call(
        _bwd_uv_kernel,
        grid=(n, nblocks),
        in_specs=[img_spec, point, point, chan],
        out_specs=(point, point),
        out_shape=(jax.ShapeDtypeStruct((n, nblocks, _TP_BWD, 1),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n, nblocks, _TP_BWD, 1),
                                        jnp.float32)),
        interpret=_interpret(),
    )(image, u4, v4, g4)

    dimg = pl.pallas_call(
        _bwd_img_kernel,
        grid=(n, nblocks),
        in_specs=[point, point, chan],
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        interpret=_interpret(),
    )(u4, v4, g4)

    du = du.reshape(n, -1)[:, :p].astype(u.dtype)
    dv = dv.reshape(n, -1)[:, :p].astype(v.dtype)
    return dimg.astype(image.dtype), du, dv


_tent_chw.defvjp(_fwd_rule, _bwd_rule)


def tent_sample_batched(images: Array, u: Array, v: Array) -> Array:
    """NHWC convenience wrapper: images [N,H,W,C], u/v [N,P] -> [N,P,C]."""
    chw = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))
    return _tent_chw(chw, u.astype(jnp.float32), v.astype(jnp.float32))
