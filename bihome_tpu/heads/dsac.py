"""DSAC-softmax hypothesis sampling & scoring, fully batched under jit.

TPU-native equivalent of ref: src/heads/ransac_utils.py:26-161. Per batch
element: sample `hypothesis_no` point subsets from the dense
coordinate/mapping field, fit each with the batched DLT
(geometry.find_homography_dlt), score all hypotheses, softmax(-score).

Everything is one [B*n, ...] batch — no Python loops over hypotheses.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from bihome_tpu import geometry

Array = jax.Array


def sample_hypotheses(points1: Array, points2: Array, key: Array,
                      hypothesis_no: int, points_per_hypothesis: int,
                      point_sampling: str = 'reference-weighted') -> Array:
    """Sample hypotheses and fit homographies.

    points1/points2: [B,N,2] -> [B,n,3,3].

    'reference-weighted' draws point indices with probability proportional
    to the index value, replicating torch.multinomial(arange(N), ...) in
    the reference (ref: src/heads/ransac_utils.py:54-57); 'uniform' draws
    uniformly.
    """
    b, n_points, _ = points1.shape
    idx = sample_point_indices(key, (b, hypothesis_no * points_per_hypothesis),
                               n_points, point_sampling)
    p1 = jnp.take_along_axis(points1, idx[..., None], axis=1)
    p2 = jnp.take_along_axis(points2, idx[..., None], axis=1)
    p1 = p1.reshape(b * hypothesis_no, points_per_hypothesis, 2)
    p2 = p2.reshape(b * hypothesis_no, points_per_hypothesis, 2)
    h = geometry.find_homography_dlt(p1, p2)
    return h.reshape(b, hypothesis_no, 3, 3)


def sample_point_indices(key: Array, shape, n_points: int,
                         point_sampling: str) -> Array:
    """Draw DSAC point indices (see :func:`sample_hypotheses`)."""
    if point_sampling == 'reference-weighted':
        # P(i) ∝ i for i in [1, N-1]; index 0 never drawn (the reference's
        # torch.multinomial(arange(N)) quirk). The CDF is analytic —
        # F(k) = k(k+1)/(N-1)N — so exact inverse-CDF sampling replaces
        # jax.random.categorical over 16k lanes (profiled ~6ms/step).
        total = float((n_points - 1) * n_points)
        u = jax.random.uniform(key, shape, dtype=jnp.float32)
        # smallest k with k(k+1) >= u·(N-1)N  ->  k = ceil((-1+sqrt(1+4uT))/2)
        k = jnp.ceil((jnp.sqrt(1.0 + 4.0 * u * total) - 1.0) / 2.0)
        return jnp.clip(k.astype(jnp.int32), 1, n_points - 1)
    if point_sampling == 'uniform':
        return jax.random.randint(key, shape, 0, n_points)
    raise ValueError(point_sampling)


def sample_hypotheses_from_pf(pf: Array, key: Array, hypothesis_no: int,
                              points_per_hypothesis: int,
                              point_sampling: str) -> Array:
    """Like :func:`sample_hypotheses` on (coords, coords+pf), but gathers
    the perspective field FIRST and reconstructs the sampled coordinates
    from the index arithmetic — identical values (mapping[i] =
    coords[i] + pf[i] pointwise), without putting the full [B,H*W,2]
    mapping tensor in the graph. End-to-end throughput at batch 64 is
    unchanged (XLA's gather fusion already avoided materializing the
    mapping); kept for the smaller graph and because it makes the
    no-scoring fast path self-contained. pf: [B,h,w,2] NHWC ->
    [B,n,3,3]."""
    b, h, w, _ = pf.shape
    n_points = h * w
    idx = sample_point_indices(key, (b, hypothesis_no * points_per_hypothesis),
                               n_points, point_sampling)
    sel = jnp.take_along_axis(pf.reshape(b, n_points, 2), idx[..., None],
                              axis=1)
    p1 = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], axis=-1)
    p2 = p1 + sel
    p1 = p1.reshape(b * hypothesis_no, points_per_hypothesis, 2)
    p2 = p2.reshape(b * hypothesis_no, points_per_hypothesis, 2)
    return geometry.find_homography_dlt(p1, p2).reshape(
        b, hypothesis_no, 3, 3)


def score_hypotheses(points1: Array, points2: Array, homographies: Array,
                     scoring_method: str = 'repr_error',
                     distance_threshold: float = 3.0,
                     distance_beta: float = 1.0,
                     score_cnn: Optional[Callable[[Array], Array]] = None
                     ) -> Tuple[Array, Array]:
    """Score each hypothesis; softmax(-scores) over hypotheses.

    points: [B,N,2]; homographies: [B,n,3,3] ->
    (scores [B,n], reprojection [B,n,N(,2)]).
    Mirrors ref: src/heads/ransac_utils.py:76-128.
    """
    b, n_points, _ = points1.shape
    n = homographies.shape[1]
    p1 = jnp.broadcast_to(points1[:, None], (b, n, n_points, 2)).reshape(
        b * n, n_points, 2)
    p2 = jnp.broadcast_to(points2[:, None], (b, n, n_points, 2)).reshape(
        b * n, n_points, 2)
    h = homographies.reshape(b * n, 3, 3)
    p1_t = geometry.transform_points(h, p1)

    if scoring_method == 'repr_error':
        err = jnp.sum(jnp.abs(p1_t - p2), axis=-1)                # [B*n,N]
        scores = jnp.sum(err, axis=-1).reshape(b, n)
        reproj = err.reshape(b, n, n_points)
    elif scoring_method == 'inliers_ratio':
        err = jnp.linalg.norm(p1_t - p2, axis=-1)
        scores = jnp.mean((err < distance_threshold).astype(jnp.float32),
                          axis=-1).reshape(b, n)
        reproj = err.reshape(b, n, n_points)
    elif scoring_method == 'soft_inliers_ratio':
        err = jnp.linalg.norm(p1_t - p2, axis=-1)
        soft = jax.nn.sigmoid(distance_beta * (err - distance_threshold))
        scores = jnp.sum(soft, axis=-1).reshape(b, n)
        reproj = soft.reshape(b, n, n_points)
    elif scoring_method == 'score_cnn':
        err = p1_t - p2                                           # [B*n,N,2]
        side = int(round(n_points ** 0.5))
        img = err.reshape(b * n, side, side, 2)
        scores = score_cnn(img).reshape(b, n)
        reproj = err.reshape(b, n, n_points, 2)
    else:
        raise ValueError(scoring_method)

    scores = jax.nn.softmax(-scores, axis=-1)
    return scores, reproj


def refine_delta_on_pf(pf: Array, delta_hat: Array,
                       threshold: float = 3.0, iters: int = 1) -> Array:
    """Robust all-points refit of a predicted corner delta
    (MODEL.HEAD.DSAC_PREDICT_REFINE — predict-only extension knob).

    The best DSAC hypothesis is fit to POINTS_PER_HYPOTHESIS sampled PF
    points, so its delta carries sampling noise; this re-fits one
    homography to ALL H*W correspondences with weights
    relu(1 - err/threshold) + eps under the hypothesis — IRLS steps of
    the weighted-DLT refinement the reference ships but never calls
    (ref: src/heads/ransac_utils.py:130-145). `iters` IRLS rounds
    (MODEL.HEAD.DSAC_PREDICT_REFINE_ITERS, default 1): each round
    re-weights by the previous fit's residuals. pf: [B,h,w,2] NHWC;
    delta_hat: [B,4,2] -> refined [B,4,2].
    """
    b, h, w, _ = pf.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)       # [N,2]
    coords = jnp.broadcast_to(coords[None], (b, h * w, 2))
    mapping = coords + pf.reshape(b, -1, 2).astype(jnp.float32)
    fp = jnp.broadcast_to(
        jnp.array([[0, 0], [w, 0], [w, h], [0, h]], jnp.float32)[None],
        (b, 4, 2))
    h_ref = geometry.four_point_to_homography(
        fp, delta_hat.astype(jnp.float32))
    for _ in range(iters):
        err = jnp.linalg.norm(
            geometry.transform_points(h_ref, coords) - mapping, axis=-1)
        # Zero weight past the inlier threshold; the small floor keeps the
        # normal equations well-posed when a bad hypothesis rejects every
        # point (falls back toward unweighted least squares).
        wgt = jax.nn.relu(1.0 - err / threshold) + 1e-3
        h_ref = geometry.find_homography_dlt(coords, mapping, wgt)
    refined = geometry.transform_points(h_ref, fp) - fp
    return refined.astype(delta_hat.dtype)


def refine_hypotheses(points1: Array, points2: Array, distances: Array,
                      hypothesis_no: int) -> Array:
    """Weighted-DLT refinement with weights 1 - distance (unused by shipped
    configs, kept for parity with ref: src/heads/ransac_utils.py:130-145)."""
    b, n_points, _ = points1.shape
    n = hypothesis_no
    p1 = jnp.broadcast_to(points1[:, None], (b, n, n_points, 2)).reshape(
        b * n, n_points, 2)
    p2 = jnp.broadcast_to(points2[:, None], (b, n, n_points, 2)).reshape(
        b * n, n_points, 2)
    w = (1.0 - distances).reshape(b * n, -1)
    h = geometry.find_homography_dlt(p1, p2, w)
    return h.reshape(b, n, 3, 3)
