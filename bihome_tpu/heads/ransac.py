"""Vectorized RANSAC homography fit (eval-time PF postprocess).

TPU-native replacement for the per-sample cv2.findHomography(..., RANSAC, 10)
loop in the reference's NoOpHead 'all_points' prediction path
(ref: src/heads/NoOpHead.py:95-106): K minimal 4-point hypotheses per sample,
inlier counting at the given threshold, best-hypothesis selection, and a
final inlier-weighted DLT refit — all batched under jit (no Python loop over
the batch or hypotheses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bihome_tpu import geometry

Array = jax.Array


def ransac_homography(points1: Array, points2: Array, key: Array,
                      num_hypotheses: int = 64,
                      threshold: float = 10.0) -> Array:
    """points1/points2: [B,N,2] -> H [B,3,3].

    Minimal 4-point hypotheses; score = inlier count at `threshold`
    (cv2.findHomography's reprojection threshold, default 10 in the
    reference call); winner refit on its inliers with weighted DLT.
    """
    b, n_points, _ = points1.shape
    idx = jax.random.randint(key, (b, num_hypotheses * 4), 0, n_points)
    p1s = jnp.take_along_axis(points1, idx[..., None], axis=1).reshape(
        b * num_hypotheses, 4, 2)
    p2s = jnp.take_along_axis(points2, idx[..., None], axis=1).reshape(
        b * num_hypotheses, 4, 2)
    h = geometry.get_perspective_transform(p1s, p2s)          # [B*K,3,3]

    p1 = jnp.broadcast_to(points1[:, None],
                          (b, num_hypotheses, n_points, 2)).reshape(
        b * num_hypotheses, n_points, 2)
    p2 = jnp.broadcast_to(points2[:, None],
                          (b, num_hypotheses, n_points, 2)).reshape(
        b * num_hypotheses, n_points, 2)
    err = jnp.linalg.norm(geometry.transform_points(h, p1) - p2, axis=-1)
    finite = jnp.all(jnp.isfinite(h.reshape(b * num_hypotheses, 9)), -1)
    inliers = (err < threshold) & finite[:, None]
    counts = jnp.sum(inliers, axis=-1).reshape(b, num_hypotheses)

    best = jnp.argmax(counts, axis=-1)                        # [B]
    sel = best[:, None, None] * jnp.ones((b, 1, 1), jnp.int32)
    inliers_b = inliers.reshape(b, num_hypotheses, n_points)
    best_inliers = jnp.take_along_axis(
        inliers_b, sel[..., :1] * jnp.ones((b, 1, n_points), jnp.int32),
        axis=1)[:, 0]                                         # [B,N]
    # Refit on inliers (weighted DLT); fall back to all-ones weights if the
    # winning hypothesis had (pathologically) no inliers.
    w = best_inliers.astype(jnp.float32)
    w = jnp.where(jnp.sum(w, -1, keepdims=True) < 4, jnp.ones_like(w), w)
    return geometry.find_homography_dlt(points1, points2, w)


def perspective_field_to_delta(pf: Array, key: Array,
                               num_hypotheses: int = 64,
                               threshold: float = 10.0):
    """NoOpHead 'all_points' postprocess (ref: src/heads/NoOpHead.py:75-109).

    pf: [B,H,W,2] dense displacement field -> (delta [B,4,2], H [B,3,3]).
    Fits a robust homography to the full coordinate->mapping field, then
    reads the displacement of the four patch corners (w, h convention of the
    reference: corners [(0,0),(W,0),(W,H),(0,H)]).
    """
    b, h_dim, w_dim, _ = pf.shape
    ys, xs = jnp.meshgrid(jnp.arange(h_dim, dtype=jnp.float32),
                          jnp.arange(w_dim, dtype=jnp.float32), indexing='ij')
    coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # [N,2]
    coords = jnp.broadcast_to(coords[None], (b, h_dim * w_dim, 2))
    mapping = coords + pf.reshape(b, -1, 2)
    h_fit = ransac_homography(coords, mapping, key,
                              num_hypotheses=num_hypotheses,
                              threshold=threshold)
    four_points = jnp.array([[0, 0], [w_dim, 0], [w_dim, h_dim], [0, h_dim]],
                            jnp.float32)
    four_points = jnp.broadcast_to(four_points[None], (b, 4, 2))
    delta = geometry.transform_points(h_fit, four_points) - four_points
    return delta, h_fit
