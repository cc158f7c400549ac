"""Batched, differentiable homography geometry for TPU.

TPU-native equivalent of the reference geometry core (ref: src/data/utils.py:7-173)
plus the kornia calls the reference relies on:

* ``get_perspective_transform`` / ``four_point_to_homography``
  (ref: src/data/utils.py:7-33, kornia.get_perspective_transform): batched
  exact 4-point homography via an 8x8 linear solve with Hartley-style
  coordinate normalization so float32 is sufficient on TPU (no float64).
* ``warp_image`` / ``warp_perspective`` (ref: src/data/utils.py:54-67,
  kornia.warp_perspective / cv2.warpPerspective): dense perspective warp with
  bilinear sampling and zero padding. Everything is expressed as one fused
  gather so XLA can tile it; gradients flow through both the image values and
  the homography (needed by the biHomE loss, ref: src/heads/PerceptualHead.py:237-243).
* ``transform_points`` (kornia.transform_points; ref: src/data/utils.py:70-136).
* ``find_homography_dlt`` (kornia.find_homography_dlt used by DSAC,
  ref: src/heads/ransac_utils.py:72): batched weighted normalized DLT solved
  with a 9x9 eigendecomposition (TPU-friendly; no SVD of tall matrices).

Coordinate convention matches cv2/kornia(align_corners=True): pixel centers at
integer coordinates, origin at the top-left pixel center, x = column,
y = row. Points are (x, y).
"""

from __future__ import annotations

import functools
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


def get_perspective_transform(src: Array, dst: Array) -> Array:
    """Exact homography mapping 4 src points onto 4 dst points, batched.

    Equivalent of kornia.get_perspective_transform / cv2.getPerspectiveTransform
    (ref: src/data/utils.py:24,30). src/dst: [B,4,2] -> H: [B,3,3] with
    H @ [x,y,1]^T ∝ [u,v,1]^T.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    t_src, src_n = _normalization_transform(src)
    t_dst, dst_n = _normalization_transform(dst)

    x, y = src_n[..., 0], src_n[..., 1]                            # [B,4]
    u, v = dst_n[..., 0], dst_n[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # Rows for u: [x y 1 0 0 0 -xu -yu]; rows for v: [0 0 0 x y 1 -xv -yv]
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u], -1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v], -1)
    a = jnp.concatenate([rows_u, rows_v], axis=1)                  # [B,8,8]
    rhs = jnp.concatenate([u, v], axis=1)[..., None]               # [B,8,1]
    h8 = jnp.linalg.solve(a, rhs)[..., 0]                          # [B,8]
    h = jnp.concatenate([h8, jnp.ones_like(h8[:, :1])], axis=1)
    h_n = h.reshape(-1, 3, 3)

    t_dst_inv = _denormalization_transform(dst)
    h_full = t_dst_inv @ h_n @ t_src
    return h_full / h_full[:, 2:3, 2:3]


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


def _warp_sampling(image: Array, sampling_h: Array,
                   target_hw: Tuple[int, int]) -> Array:
    """dst(x) = src(S·x) for one image [H,W,C] and one 3x3 S."""
    th, tw = target_hw
    ys, xs = jnp.meshgrid(jnp.arange(th, dtype=jnp.float32),
                          jnp.arange(tw, dtype=jnp.float32), indexing='ij')
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1),
                      jnp.ones(th * tw, jnp.float32)], axis=0)     # [3,HW]
    mapped = sampling_h @ grid                                     # [3,HW]
    denom = mapped[2]
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.full_like(denom, 1e-12), denom)
    u = mapped[0] / denom
    v = mapped[1] / denom
    out = bilinear_sample(image, u, v)                             # [HW,C]
    return out.reshape(th, tw, image.shape[-1])


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
    sampling = homography if inverse else jnp.linalg.inv(homography)
    return jax.vmap(functools.partial(_warp_sampling, target_hw=target_hw))(
        image, sampling)


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


def find_homography_dlt(points1: Array, points2: Array,
                        weights: Optional[Array] = None) -> Array:
    """Batched (weighted) normalized DLT homography fit.

    TPU-native equivalent of kornia.find_homography_dlt
    (ref: src/heads/ransac_utils.py:72,143). Instead of an SVD of the tall
    [2N,9] design matrix we form the 9x9 normal matrix AᵀWA and take the
    eigenvector of its smallest eigenvalue — a tiny, batched, MXU-friendly
    problem that is differentiable via jnp.linalg.eigh.

    points1/points2: [B,N,2]; weights: optional [B,N] -> H: [B,3,3].
    """
    p1n, t1 = _normalize_point_cloud(points1.astype(jnp.float32))
    p2n, t2 = _normalize_point_cloud(points2.astype(jnp.float32))

    x, y = p1n[..., 0], p1n[..., 1]                                # [B,N]
    u, v = p2n[..., 0], p2n[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    ax = jnp.stack([-x, -y, -ones, zeros, zeros, zeros,
                    u * x, u * y, u], axis=-1)                     # [B,N,9]
    ay = jnp.stack([zeros, zeros, zeros, -x, -y, -ones,
                    v * x, v * y, v], axis=-1)                     # [B,N,9]
    a = jnp.concatenate([ax, ay], axis=1)                          # [B,2N,9]
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=1)            # [B,2N]
        ata = jnp.einsum('bni,bn,bnj->bij', a, w.astype(a.dtype), a)
    else:
        ata = jnp.einsum('bni,bnj->bij', a, a)                     # [B,9,9]
    # Smallest eigenvector of the symmetric normal matrix.
    _, eigvecs = jnp.linalg.eigh(ata)
    h = eigvecs[..., 0].reshape(-1, 3, 3)                          # [B,3,3]
    h_full = jnp.linalg.inv(t2) @ h @ t1
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
