"""Batched, differentiable homography geometry for TPU.

TPU-native equivalent of the reference geometry core (ref: src/data/utils.py:7-173)
plus the kornia calls the reference relies on:

* ``get_perspective_transform`` / ``four_point_to_homography``
  (ref: src/data/utils.py:7-33, kornia.get_perspective_transform): batched
  exact 4-point homography via an 8x8 linear solve with Hartley-style
  coordinate normalization so float32 is sufficient on TPU (no float64).
* ``warp_image`` / ``warp_perspective`` (ref: src/data/utils.py:54-67,
  kornia.warp_perspective / cv2.warpPerspective): dense perspective warp with
  bilinear sampling and zero padding — MXU tent contractions on TPU, gathers
  elsewhere; gradients flow through both the image values and the homography
  (needed by the biHomE loss, ref: src/heads/PerceptualHead.py:237-243).
* ``transform_points`` (kornia.transform_points; ref: src/data/utils.py:70-136).
* ``find_homography_dlt`` (kornia.find_homography_dlt used by DSAC,
  ref: src/heads/ransac_utils.py:72): batched weighted DLT via the 8x8
  normal equations and a statically unrolled Cholesky (no LAPACK on TPU).

Coordinate convention matches cv2/kornia(align_corners=True): pixel centers at
integer coordinates, origin at the top-left pixel center, x = column,
y = row. Points are (x, y).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


Array = jax.Array


def image_corners(height: int, width: int, batch_size: Optional[int] = None,
                  dtype=jnp.float32) -> Array:
    """Corner points [(0,0),(w,0),(w,h),(0,h)] of an image, optionally batched.

    Equivalent of ref: src/data/utils.py:36-51 (``image_shape_to_corners``).
    (The reference reads H/W from NCHW dims -2/-1 in transposed order; for the
    square patches used everywhere this is identical — we use (w, h) as (x, y).)
    """
    corners = jnp.array(
        [[0, 0], [width, 0], [width, height], [0, height]], dtype=dtype)
    if batch_size is not None:
        corners = jnp.tile(corners[None], (batch_size, 1, 1))
    return corners


def _normalization_transform(points: Array) -> Tuple[Array, Array]:
    """Per-batch similarity transform T mapping points into ~[-1, 1].

    Returns (T [B,3,3], T applied to points [B,N,2]). Used to condition the
    4-point solve so float32 is accurate for pixel coordinates up to O(1e3).
    """
    center = jnp.mean(points, axis=1, keepdims=True)               # [B,1,2]
    shifted = points - center
    scale = jnp.maximum(jnp.max(jnp.abs(shifted), axis=(1, 2)), 1e-8)  # [B]
    normalized = shifted / scale[:, None, None]
    b = points.shape[0]
    inv_s = 1.0 / scale
    t = jnp.zeros((b, 3, 3), dtype=points.dtype)
    t = t.at[:, 0, 0].set(inv_s)
    t = t.at[:, 1, 1].set(inv_s)
    t = t.at[:, 0, 2].set(-center[:, 0, 0] * inv_s)
    t = t.at[:, 1, 2].set(-center[:, 0, 1] * inv_s)
    t = t.at[:, 2, 2].set(1.0)
    return t, normalized


def _denormalization_transform(points: Array) -> Array:
    """Inverse of :func:`_normalization_transform`'s T for a point set."""
    center = jnp.mean(points, axis=1)                              # [B,2]
    scale = jnp.maximum(
        jnp.max(jnp.abs(points - center[:, None]), axis=(1, 2)), 1e-8)
    b = points.shape[0]
    t = jnp.zeros((b, 3, 3), dtype=points.dtype)
    t = t.at[:, 0, 0].set(scale)
    t = t.at[:, 1, 1].set(scale)
    t = t.at[:, 0, 2].set(center[:, 0])
    t = t.at[:, 1, 2].set(center[:, 1])
    t = t.at[:, 2, 2].set(1.0)
    return t


def inv3x3(m: Array) -> Array:
    """Closed-form (adjugate) batched 3x3 inverse.

    TPU-native: jnp.linalg.inv lowers to LU, which is scalarized and slow on
    TPU; the adjugate is a handful of fused VPU ops. m: [...,3,3].
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1),
    ], axis=-2)
    return adj / det[..., None, None]


def _square_to_quad(quad: Array) -> Array:
    """Closed-form homography mapping the unit square
    (0,0),(1,0),(1,1),(0,1) onto ``quad`` [B,4,2] (Heckbert '89, "Fundamentals
    of Texture Mapping", §2.2). Pure elementwise math — no linear solve."""
    x0, y0 = quad[:, 0, 0], quad[:, 0, 1]
    x1, y1 = quad[:, 1, 0], quad[:, 1, 1]
    x2, y2 = quad[:, 2, 0], quad[:, 2, 1]
    x3, y3 = quad[:, 3, 0], quad[:, 3, 1]
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    dx1 = x1 - x2
    dx2 = x3 - x2
    dy1 = y1 - y2
    dy2 = y3 - y2
    den = dx1 * dy2 - dx2 * dy1
    den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    g = (sx * dy2 - dx2 * sy) / den
    h = (dx1 * sy - sx * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    ones = jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([a, b, c], -1),
        jnp.stack([d, e, f], -1),
        jnp.stack([g, h, ones], -1),
    ], axis=-2)


def get_perspective_transform(src: Array, dst: Array) -> Array:
    """Exact homography mapping 4 src points onto 4 dst points, batched.

    Equivalent of kornia.get_perspective_transform / cv2.getPerspectiveTransform
    (ref: src/data/utils.py:24,30). src/dst: [B,4,2] -> H: [B,3,3] with
    H @ [x,y,1]^T ∝ [u,v,1]^T.

    TPU-native: composed from two closed-form square->quad homographies
    (H = Q(dst) · Q(src)^-1) instead of the 8x8 linear solve — LU is
    scalarized and slow on TPU, this is pure fused elementwise math.
    Coordinates are pre-normalized per batch for float32 robustness.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    t_src, src_n = _normalization_transform(src)
    t_dst, dst_n = _normalization_transform(dst)
    q_src = _square_to_quad(src_n)
    q_dst = _square_to_quad(dst_n)
    h_n = q_dst @ inv3x3(q_src)
    t_dst_inv = _denormalization_transform(dst)
    h_full = t_dst_inv @ h_n @ t_src
    return _normalize_gauge(h_full)


def _normalize_gauge(h_full: Array) -> Array:
    """Scale-normalize homographies, robust to the h33->0 gauge singularity.

    A homography is defined up to scale; cv2/kornia fix h33=1. For patches
    far from the image origin the TRUE h33 can legitimately pass through
    zero (the projective row cancels the translation), and dividing by it in
    float32 yields inf/NaN — observed once every few hundred datagen batches.
    Every consumer (warp division, transform_points, inv3x3) is
    scale-invariant, so when |h33| is small relative to the matrix we divide
    by the (sign-matched) max entry instead of h33.
    """
    h22 = h_full[:, 2:3, 2:3]
    maxabs = jnp.max(jnp.abs(h_full), axis=(1, 2), keepdims=True)
    maxabs = jnp.maximum(maxabs, 1e-20)
    safe = jnp.abs(h22) > 1e-5 * maxabs
    fallback = jnp.where(h22 < 0, -maxabs, maxabs)
    return h_full / jnp.where(safe, h22, fallback)


def four_point_to_homography(corners: Array, deltas: Array,
                             crop: bool = False) -> Array:
    """Homography mapping ``corners`` to ``corners + deltas``.

    Equivalent of ref: src/data/utils.py:7-33. With ``crop=True`` corners are
    first shifted so the top-left corner is the origin (patch-local frame).
    corners/deltas: [B,4,2] -> [B,3,3].
    """
    if crop:
        corners = corners - corners[:, 0:1]
    return get_perspective_transform(corners, corners + deltas)


def transform_points(homography: Array, points: Array) -> Array:
    """Apply homographies to 2D points. [B,3,3] x [B,N,2] -> [B,N,2].

    Equivalent of kornia.transform_points and the reference's
    ``perspectiveTransform[Batched]`` (ref: src/data/utils.py:70-136).
    """
    ones = jnp.ones_like(points[..., :1])
    pts_h = jnp.concatenate([points, ones], axis=-1)               # [B,N,3]
    out = jnp.einsum('bij,bnj->bni', homography, pts_h)
    denom = out[..., 2:3]
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.full_like(denom, 1e-12), denom)
    return out[..., :2] / denom


def bilinear_sample(image: Array, x: Array, y: Array) -> Array:
    """Bilinearly sample ``image`` [H,W,C] at float coords (x, y) [N].

    Zero padding outside the image (cv2 BORDER_CONSTANT(0) /
    grid_sample padding_mode='zeros' semantics): each of the four integer
    neighbors contributes 0 where it falls outside.
    Returns [N,C].
    """
    h, w, _ = image.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = image[yi_c, xi_c]                                   # [N,C]
        return vals * (wgt * valid)[:, None]

    return (tap(y0, x0, wy0 * wx0) + tap(y0, x0 + 1, wy0 * wx1)
            + tap(y0 + 1, x0, wy1 * wx0) + tap(y0 + 1, x0 + 1, wy1 * wx1))


def tent_sample(image: Array, x: Array, y: Array) -> Array:
    """MXU bilinear sampling: contractions against tent (hat) weights.

    Mathematically identical to :func:`bilinear_sample` (zero padding
    included — tent weights vanish outside the image), but expressed as two
    dense contractions so the TPU matrix unit does the work instead of a
    scalarized gather:

        out[p,c] = Σ_h relu(1-|y_p-h|) · Σ_w relu(1-|x_p-w|) · img[h,w,c]

    The H·W/4 redundancy factor is far cheaper than TPU gather latency
    (measured ~40x faster for 128px warps). Memory of the [P,W,C]
    intermediate is bounded by the batch grouping in ``batched_sample``.
    image: [H,W,C]; x,y: [P] -> [P,C].
    """
    h, w, c = image.shape
    p = x.shape[0]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    # No sequential chunk loop: lax.map lowers to a while loop that
    # serializes fwd AND bwd (profiled as the dominant step cost). The
    # [P,W,C] intermediate is the price; XLA tiles the two contractions.
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - ys[None, :]))  # [P,H]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xs[None, :]))  # [P,W]
    # bf16 images keep the big [P,W,C] intermediate in bf16 (halves the
    # dominant HBM traffic). Accumulation precision is a non-issue: each
    # output element sums exactly 2 nonzero tent terms per axis.
    if image.dtype == jnp.bfloat16:
        tmp = jnp.einsum('ph,hwc->pwc', wy.astype(jnp.bfloat16), image,
                         preferred_element_type=jnp.bfloat16)
        return jnp.einsum('pw,pwc->pc', wx.astype(jnp.bfloat16), tmp,
                          preferred_element_type=jnp.float32)
    tmp = jnp.einsum('ph,hwc->pwc', wy, image,
                     preferred_element_type=jnp.float32)
    return jnp.einsum('pw,pwc->pc', wx, tmp,
                      preferred_element_type=jnp.float32)



def _use_tent() -> bool:
    """Fused Pallas tent sampling on TPU; gather on CPU/GPU (where gather is
    fast and the tent redundancy is a net loss)."""
    return jax.default_backend() == 'tpu'


def _sample(image: Array, u: Array, v: Array) -> Array:
    """Single-image sampling (kept for API/tests; hot paths use
    :func:`batched_sample`)."""
    if _use_tent():
        return tent_sample(image, u, v)
    return bilinear_sample(image, u, v)


def batched_sample(images: Array, u: Array, v: Array) -> Array:
    """Batched bilinear sampling — THE warp hot path.

    images [B,H,W,C], u/v [B,P] -> [B,P,C]. On TPU this is the fused Pallas
    kernel (ops/warp_pallas.py: tent weights + contractions in VMEM, custom
    VJP); elsewhere a vmapped gather.
    """
    if _use_tent():
        import os
        # Default: the XLA tent formulation — measured faster end-to-end
        # than the hand-written Pallas kernel (XLA's fused [P,W]x[W,HC]
        # matmuls beat per-block kernel dots; see ops/warp_pallas.py).
        # BIHOME_WARP_IMPL=pallas selects the fused kernel.
        if os.environ.get('BIHOME_WARP_IMPL', 'xla') == 'pallas':
            from bihome_tpu.ops import warp_pallas
            return warp_pallas.tent_sample_batched(images, u, v)
        b, _, w, c = images.shape
        fits = (u.shape[-1] * w * c * 4) * b <= _tent_group_bytes()
        if (c == 1 and fits
                and os.environ.get('BIHOME_WARP_BWD', 'c1') == 'c1'):
            return _tent_c1(images, u, v)
        return _tent_batch_grouped(images, u, v)
    return jax.vmap(bilinear_sample)(images, u, v)


def _tent_w(coords: Array, n: int, dtype) -> Array:
    grid = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(coords[..., None] - grid)).astype(dtype)


def _tent_dw(coords: Array, n: int, dtype) -> Array:
    # d/dcoord of max(0, 1-|coord-k|). At |d|==1 autodiff splits the
    # maximum tie 0.5; we take 0 — measure-zero, irrelevant for real warps.
    grid = jnp.arange(n, dtype=jnp.float32)
    d = coords[..., None] - grid
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0).astype(dtype)


@jax.custom_vjp
def _tent_c1(images: Array, u: Array, v: Array) -> Array:
    """Single-channel batched tent warp with a materialization-free VJP.

    Forward is the same two-contraction tent formulation as tent_sample.
    XLA's autodiff of that chain saves/rebuilds the [B,P,W,C] intermediate
    and forms d(tmp) as an outer product — ~1.6GB of HBM round-trips per
    flagship loss-warp step (profiled r3: ~3.3 ms/step in bwd:loss). For
    C == 1 every backward term is a clean batched matmul instead:

        d_img[h,w] = sum_p (wy.g)[p,h] wx[p,w]      == [H,P]x[P,W]
        du[p] = g[p] . sum_w dwx[p,w] (wy@img)[p,w]
        dv[p] = g[p] . sum_h dwy[p,h] (wx@img^T)[p,h]

    so nothing outer-product-shaped is ever written to HBM.
    """
    b, h, w, c = images.shape
    dt = images.dtype
    img2 = images[..., 0]
    wy = _tent_w(v, h, dt)                                     # [B,P,H]
    wx = _tent_w(u, w, dt)                                     # [B,P,W]
    tmp = jnp.einsum('bph,bhw->bpw', wy, img2,
                     preferred_element_type=dt)
    out = jnp.einsum('bpw,bpw->bp', wx, tmp,
                     preferred_element_type=jnp.float32)
    return out[..., None]


def _tent_c1_fwd(images, u, v):
    return _tent_c1(images, u, v), (images, u, v)


def _tent_c1_bwd(res, g):
    images, u, v = res
    b, h, w, c = images.shape
    dt = images.dtype
    img2 = images[..., 0]
    gb = g[..., 0].astype(jnp.float32)                         # [B,P]
    wy = _tent_w(v, h, dt)
    wx = _tent_w(u, w, dt)
    wyg = (wy.astype(jnp.float32) * gb[..., None]).astype(dt)
    d_img = jnp.einsum('bph,bpw->bhw', wyg, wx,
                       preferred_element_type=jnp.float32)
    t1 = jnp.einsum('bph,bhw->bpw', wy, img2, preferred_element_type=dt)
    du = gb * jnp.einsum('bpw,bpw->bp', _tent_dw(u, w, dt), t1,
                         preferred_element_type=jnp.float32)
    t2 = jnp.einsum('bpw,bhw->bph', wx, img2, preferred_element_type=dt)
    dv = gb * jnp.einsum('bph,bph->bp', _tent_dw(v, h, dt), t2,
                         preferred_element_type=jnp.float32)
    return (d_img[..., None].astype(images.dtype), du.astype(u.dtype),
            dv.astype(v.dtype))


_tent_c1.defvjp(_tent_c1_fwd, _tent_c1_bwd)


# Cap on the [group, P, W, C] tent intermediate. Without grouping the
# intermediate scales linearly with batch and falls off the HBM cliff
# (measured: batch 256 datagen warp -> 4.8GB transient, 13x throughput
# collapse). Groups stay large so each lax.map iteration still saturates
# the MXU (unlike fine-grained point-chunking, which serialized).
# The cap must keep the flagship biHomE loss warp (batch 64 ->
# [128n,16384,128,2] ~2.1GB) in ONE group on v5e — grouping it serializes
# fwd+bwd through a lax.map and costs ~2x end-to-end (measured 1028 ->
# 577 pairs/s). 3GiB/16GiB HBM was the tuned v5e point; scale that ratio
# by the actual device HBM (memory_stats) so smaller/larger parts don't
# silently fall off the cliff. BIHOME_TENT_GROUP_BYTES overrides.
_TENT_GROUP_BYTES_V5E = 3 * 1024 * 1024 * 1024
_tent_group_bytes_cache: Optional[int] = None


def _tent_group_bytes() -> int:
    global _tent_group_bytes_cache
    if _tent_group_bytes_cache is None:
        import os
        env = os.environ.get('BIHOME_TENT_GROUP_BYTES')
        if env:
            _tent_group_bytes_cache = int(env)
        else:
            limit = None
            try:
                stats = jax.devices()[0].memory_stats()
                if stats:
                    limit = stats.get('bytes_limit')
            except Exception:
                limit = None
            if limit:
                # 3/16 of HBM, floored at 256MB so tiny CPU "devices"
                # still group coarsely rather than per-sample.
                _tent_group_bytes_cache = max(
                    256 * 1024 * 1024, int(limit) * 3 // 16)
            else:
                _tent_group_bytes_cache = _TENT_GROUP_BYTES_V5E
    return _tent_group_bytes_cache


def _tent_batch_grouped(images: Array, u: Array, v: Array) -> Array:
    b, h, w, c = images.shape
    p = u.shape[-1]
    per_image = p * w * c * 4
    group = max(1, min(b, _tent_group_bytes() // max(per_image, 1)))
    if group >= b:
        return jax.vmap(tent_sample)(images, u, v)
    pad = (-b) % group
    if pad:
        images = jnp.concatenate(
            [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
        u = jnp.concatenate([u, jnp.full((pad, p), -2.0, u.dtype)])
        v = jnp.concatenate([v, jnp.full((pad, p), -2.0, v.dtype)])
    ng = images.shape[0] // group
    out = jax.lax.map(
        lambda args: jax.vmap(tent_sample)(*args),
        (images.reshape(ng, group, h, w, c),
         u.reshape(ng, group, p), v.reshape(ng, group, p)))
    return out.reshape(ng * group, p, c)[:b]


def crop_integer(images: Array, x0: Array, y0: Array,
                 size_hw: Tuple[int, int]) -> Array:
    """Batched exact crop at per-sample integer offsets, MXU-formulated.

    images [B,H,W,C], x0/y0 [B] int -> [B,sh,sw,C]. Two factorized one-hot
    contractions (rows then cols) — a vmapped lax.dynamic_slice serializes
    into a per-sample while loop on TPU at larger batches; this is a pair of
    tiny matmuls instead. Offsets are assumed in-bounds (callers guarantee
    the patch margin); out-of-range rows select zeros.
    """
    sh, sw = size_hw
    b, h, w, c = images.shape
    if (sh, sw) == (h, w):
        # Full-size crop: callers guarantee in-bounds offsets (clipped to
        # [0, dim-size] = {0}), so this is the identity — skip the two
        # one-hot contractions (hit by the window-first datagen path when
        # the window already IS the image).
        return images
    rows = (jnp.arange(h)[None, None, :]
            == (y0.astype(jnp.int32)[:, None]
                + jnp.arange(sh))[:, :, None])               # [B,sh,H]
    cols = (jnp.arange(w)[None, None, :]
            == (x0.astype(jnp.int32)[:, None]
                + jnp.arange(sw))[:, :, None])               # [B,sw,W]
    tmp = jnp.einsum('bph,bhwc->bpwc', rows.astype(images.dtype), images)
    return jnp.einsum('bqw,bpwc->bpqc', cols.astype(images.dtype), tmp)


def homography_grid(homography: Array, target_hw: Tuple[int, int],
                    offset: Optional[Array] = None
                    ) -> Tuple[Array, Array]:
    """Map the target pixel grid through batched homographies.

    Returns (u, v) each [B, th*tw]: source coords for dst(x)=src(H·x).
    ``offset`` [B,2] shifts the target grid (absolute-coordinate patches).
    """
    th, tw = target_hw
    ys, xs = jnp.meshgrid(jnp.arange(th, dtype=jnp.float32),
                          jnp.arange(tw, dtype=jnp.float32), indexing='ij')
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1),
                      jnp.ones(th * tw, jnp.float32)], axis=0)     # [3,P]
    if offset is not None:
        grid = jnp.concatenate([
            grid[:2] + offset.astype(jnp.float32)[..., None],
            jnp.broadcast_to(grid[2:], (homography.shape[0], 1,
                                        th * tw))], axis=-2)
        mapped = jnp.einsum('bij,bjp->bip', homography, grid)
    else:
        mapped = jnp.einsum('bij,jp->bip', homography, grid)      # [B,3,P]
    denom = mapped[:, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.full_like(denom, 1e-12), denom)
    return mapped[:, 0] / denom, mapped[:, 1] / denom


def ones_warp_mask(u: Array, v: Array, source_hw: Tuple[int, int]) -> Array:
    """Closed form of warping an all-ones image: the bilinear support mask.

    warp(ones)(p) = Σ_h tent(v_p-h) · Σ_w tent(u_p-w), and each axis sum has
    the closed form clip(min(t+1, S-1-t+1), 0, 1): exactly 1 in the interior,
    a linear ramp over the 1px boundary band, 0 outside. Identical numerics
    to sampling a ones-channel at ~5 VPU ops/point instead of a full warp
    channel — halves the biHomE loss-warp cost for the shipped (mask-less)
    configs (ref masks default to ones: PerceptualHead.py:334-340).

    u, v: [B, P] source coords -> [B, P] mask.
    """
    sh, sw = source_hw
    gu = jnp.clip(jnp.minimum(u + 1.0, sw - u), 0.0, 1.0)
    gv = jnp.clip(jnp.minimum(v + 1.0, sh - v), 0.0, 1.0)
    return gu * gv


def warp_image(image: Array, homography: Array,
               target_hw: Optional[Tuple[int, int]] = None,
               inverse: bool = True) -> Array:
    """Warp NHWC images by homographies with reference semantics.

    Matches ref: src/data/utils.py:54-67: ``warp_image(img, H, inverse=True)``
    computes ``cv2.warpPerspective(img, H^-1)``, i.e. dst(x) = src(H·x). We
    sample directly with H (no explicit double inversion — better conditioned
    and cheaper). With ``inverse=False`` it equals cv2.warpPerspective(img, H):
    dst(x) = src(H^-1·x).

    image: [B,H,W,C]; homography: [B,3,3]; returns [B,th,tw,C].
    """
    if target_hw is None:
        target_hw = (image.shape[1], image.shape[2])
    sampling = homography if inverse else inv3x3(homography)
    u, v = homography_grid(sampling, target_hw)
    out = batched_sample(image, u, v)                              # [B,P,C]
    return out.reshape(image.shape[0], target_hw[0], target_hw[1],
                       image.shape[-1])


def warp_perspective(image: Array, m: Array,
                     target_hw: Optional[Tuple[int, int]] = None) -> Array:
    """cv2.warpPerspective / kornia.warp_perspective convention:

    dst(x) = src(M^-1 · x). image: [B,H,W,C], m: [B,3,3].
    """
    return warp_image(image, m, target_hw=target_hw, inverse=False)


def _normalize_point_cloud(points: Array) -> Tuple[Array, Array]:
    """kornia-style point normalization: zero mean, mean distance sqrt(2).

    Returns (normalized points [B,N,2], transform [B,3,3]).
    """
    mean = jnp.mean(points, axis=1, keepdims=True)                 # [B,1,2]
    dist = jnp.linalg.norm(points - mean, axis=-1)                 # [B,N]
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(dist, axis=-1), 1e-8)  # [B]
    b = points.shape[0]
    t = jnp.zeros((b, 3, 3), dtype=points.dtype)
    t = t.at[:, 0, 0].set(scale)
    t = t.at[:, 1, 1].set(scale)
    t = t.at[:, 0, 2].set(-mean[:, 0, 0] * scale)
    t = t.at[:, 1, 2].set(-mean[:, 0, 1] * scale)
    t = t.at[:, 2, 2].set(1.0)
    normalized = (points - mean) * scale[:, None, None]
    return normalized, t


def solve_psd_unrolled(a: Array, b: Array) -> Array:
    """Batched SPD solve via statically unrolled Cholesky.

    a: [B,n,n] (n small & static), b: [B,n] -> x: [B,n]. Every operation is
    a vectorized-over-batch scalar op — no LU/LAPACK lowering, so it runs at
    VPU speed on TPU where jnp.linalg.solve is scalarized.
    """
    n = a.shape[-1]
    low = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[:, i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            if i == j:
                low[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                low[i][j] = s / low[j][j]
    y = []
    for i in range(n):
        s = b[:, i]
        for k in range(i):
            s = s - low[i][k] * y[k]
        y.append(s / low[i][i])
    x: list = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[k][i] * x[k]
        x[i] = s / low[i][i]
    return jnp.stack(x, axis=-1)


def find_homography_dlt(points1: Array, points2: Array,
                        weights: Optional[Array] = None,
                        method: str = 'cholesky') -> Array:
    """Batched (weighted) normalized DLT homography fit.

    TPU-native equivalent of kornia.find_homography_dlt
    (ref: src/heads/ransac_utils.py:72,143).

    method='cholesky' (default, fast on TPU): inhomogeneous DLT — fix h33=1
    and solve the 8x8 weighted normal equations with an unrolled Cholesky.
    method='eigh': homogeneous DLT — smallest eigenvector of the 9x9 normal
    matrix (kornia's SVD formulation; slower on TPU, kept for parity checks).

    points1/points2: [B,N,2]; weights: optional [B,N] -> H: [B,3,3].
    """
    p1n, t1 = _normalize_point_cloud(points1.astype(jnp.float32))
    p2n, t2 = _normalize_point_cloud(points2.astype(jnp.float32))

    x, y = p1n[..., 0], p1n[..., 1]                                # [B,N]
    u, v = p2n[..., 0], p2n[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    if method == 'cholesky':
        # Rows for u: [x y 1 0 0 0 -xu -yu] h8 = u; same pattern for v.
        ax = jnp.stack([x, y, ones, zeros, zeros, zeros,
                        -x * u, -y * u], axis=-1)                  # [B,N,8]
        ay = jnp.stack([zeros, zeros, zeros, x, y, ones,
                        -x * v, -y * v], axis=-1)
        a = jnp.concatenate([ax, ay], axis=1)                      # [B,2N,8]
        rhs = jnp.concatenate([u, v], axis=1)                      # [B,2N]
        if weights is not None:
            w = jnp.concatenate([weights, weights],
                                axis=1).astype(a.dtype)            # [B,2N]
            ata = jnp.einsum('bni,bn,bnj->bij', a, w, a)
            atb = jnp.einsum('bni,bn,bn->bi', a, w, rhs)
        else:
            ata = jnp.einsum('bni,bnj->bij', a, a)                 # [B,8,8]
            atb = jnp.einsum('bni,bn->bi', a, rhs)
        # Tikhonov epsilon keeps degenerate samples finite (RANSAC rejects
        # them by score anyway).
        ata = ata + 1e-6 * jnp.eye(8, dtype=ata.dtype)
        h8 = solve_psd_unrolled(ata, atb)                          # [B,8]
        h = jnp.concatenate([h8, jnp.ones_like(h8[:, :1])],
                            axis=1).reshape(-1, 3, 3)
    elif method == 'eigh':
        ax = jnp.stack([-x, -y, -ones, zeros, zeros, zeros,
                        u * x, u * y, u], axis=-1)                 # [B,N,9]
        ay = jnp.stack([zeros, zeros, zeros, -x, -y, -ones,
                        v * x, v * y, v], axis=-1)
        a = jnp.concatenate([ax, ay], axis=1)                      # [B,2N,9]
        if weights is not None:
            w = jnp.concatenate([weights, weights], axis=1)
            ata = jnp.einsum('bni,bn,bnj->bij', a, w.astype(a.dtype), a)
        else:
            ata = jnp.einsum('bni,bnj->bij', a, a)                 # [B,9,9]
        _, eigvecs = jnp.linalg.eigh(ata)
        h = eigvecs[..., 0].reshape(-1, 3, 3)
    else:
        raise ValueError(method)

    h_full = inv3x3(t2) @ h @ t1
    denom = h_full[:, 2:3, 2:3]
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.full_like(denom, 1e-12), denom)
    return h_full / denom


def mace(delta_gt: Array, delta_hat: Array) -> Array:
    """Mean Average Corner Error in pixels (ref: eval.py:133-134).

    Mean over batch & corners of the L2 distance between gt and predicted
    corner displacements. delta_*: [B,4,2] (any leading shape reshaped).
    """
    diff = (delta_gt.reshape(-1, 2) - delta_hat.reshape(-1, 2))
    return jnp.mean(jnp.linalg.norm(diff, axis=-1))


def calc_reprojection_error(source_points: Array, target_points: Array,
                            homography: Array) -> Array:
    """Sum of squared reprojection errors (ref: src/data/utils.py:139-172).

    source/target: [N,2] (unbatched, like the reference), homography [3,3].
    """
    transformed = transform_points(homography[None], source_points[None])[0]
    return jnp.sum((transformed - target_points) ** 2)
