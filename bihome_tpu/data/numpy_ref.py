"""Pure-numpy mirror of the reference datagen chain (golden-test oracle).

Replicates HomographyNetPrep + DictToGrayscale + DictStandardize
(ref: src/data/transforms.py:456-725) with numpy float64 math and the exact
np.random.RandomState call order of the reference, but WITHOUT cv2/kornia
(not available here): the homography solve and warp are implemented directly
from their mathematical definitions. Used to validate the jit datagen in
bihome_tpu.data.pipeline (SURVEY §7: "keep a numpy parity path for golden
tests") and as a slow host fallback.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def solve_homography_4pt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 4-point homography (cv2.getPerspectiveTransform equivalent)."""
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros((8,), dtype=np.float64)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def apply_homography(h: np.ndarray, pts: np.ndarray) -> np.ndarray:
    pts_h = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    out = pts_h @ h.T
    return out[:, :2] / out[:, 2:3]


def warp_image(image: np.ndarray, homography: np.ndarray,
               inverse: bool = True) -> np.ndarray:
    """dst(x) = src(H·x) (inverse=True, the reference's warp_image semantics,
    ref: src/data/utils.py:54-67), bilinear, zero padding. Vectorized numpy."""
    s = homography if inverse else np.linalg.inv(homography)
    h, w = image.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], axis=0)
    mapped = s @ pts
    u = mapped[0] / mapped[2]
    v = mapped[1] / mapped[2]
    x0 = np.floor(u).astype(np.int64)
    y0 = np.floor(v).astype(np.int64)
    fx = u - x0
    fy = v - y0
    out = np.zeros((h * w, image.shape[2]), dtype=np.float64)
    for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
                        (1, 0, fy * (1 - fx)), (1, 1, fy * fx)):
        yi = y0 + dy
        xi = x0 + dx
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        vals = image[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
        out += vals * (wgt * valid)[:, None]
    return out.reshape(h, w, image.shape[2])


def photometric_distort_simple(image: np.ndarray, max_delta: float,
                               rs: np.random.RandomState) -> np.ndarray:
    """Numpy PhotometricDistortSimple with the reference's exact call order
    (ref: src/data/transforms.py:296-330)."""
    im = image.astype(np.float32).copy()
    lower = 1.0 - max_delta / 32 * 0.5
    upper = 1.0 + max_delta / 32 * 0.5
    # Brightness.
    if rs.randint(2):
        im += rs.uniform(-max_delta, max_delta)
    skip_last = bool(rs.randint(2))

    def contrast(x):
        if rs.randint(2):
            x = x * rs.uniform(lower, upper)
        return x

    def to_hsv(x):
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        v = np.maximum(np.maximum(r, g), b)
        mn = np.minimum(np.minimum(r, g), b)
        d = v - mn
        sd = np.where(d == 0, 1.0, d)
        hh = np.where(v == r, 60 * (g - b) / sd,
                      np.where(v == g, 120 + 60 * (b - r) / sd,
                               240 + 60 * (r - g) / sd))
        hh = np.where(d == 0, 0.0, hh)
        hh = np.where(hh < 0, hh + 360.0, hh)
        sv = np.where(v == 0, 1.0, v)
        s = np.where(v == 0, 0.0, d / sv)
        return np.stack([hh, s, v], axis=-1)

    def to_rgb(x):
        hh, s, v = x[..., 0], x[..., 1], x[..., 2]
        h60 = hh / 60.0
        i = np.floor(h60).astype(np.int64) % 6
        f = h60 - np.floor(h60)
        p = v * (1 - s)
        q = v * (1 - f * s)
        t = v * (1 - (1 - f) * s)
        r = np.choose(i, [v, q, p, p, t, v])
        g = np.choose(i, [t, v, v, q, p, p])
        b = np.choose(i, [p, p, t, v, v, q])
        return np.stack([r, g, b], axis=-1)

    def saturation(x):
        if rs.randint(2):
            x[..., 1] *= rs.uniform(lower, upper)
        return x

    def hue(x):
        if rs.randint(2):
            x[..., 0] += rs.uniform(-max_delta / 2, max_delta / 2)
            x[..., 0][x[..., 0] > 360.0] -= 360.0
            x[..., 0][x[..., 0] < 0.0] += 360.0
        return x

    if skip_last:
        im = contrast(im)
        im = to_rgb(hue(saturation(to_hsv(im))))
    else:
        im = to_rgb(hue(saturation(to_hsv(im))))
        im = contrast(im)

    if max_delta > 0 and rs.randint(2):
        perms = ((0, 1, 2), (0, 2, 1), (1, 0, 2),
                 (1, 2, 0), (2, 0, 1), (2, 1, 0))
        im = im[..., perms[rs.randint(len(perms))]]
    return im


def homography_net_prep(image: np.ndarray, rho: int, patch_size: int,
                        photometric_keys=('image_1', 'image_2'),
                        max_delta: float = 32.0, target_gen: str = '4_points',
                        rs: Optional[np.random.RandomState] = None,
                        corners: Optional[np.ndarray] = None,
                        delta: Optional[np.ndarray] = None
                        ) -> Dict[str, np.ndarray]:
    """Single-sample reference chain. ``corners``/``delta`` may be injected
    for deterministic comparison against the jit pipeline."""
    rs = rs or np.random.RandomState()
    h, w = image.shape[:2]
    image_1 = np.copy(image).astype(np.float64)
    if 'image_1' in photometric_keys and max_delta > 0:
        image_1 = photometric_distort_simple(image_1, max_delta, rs)
    image_2 = np.copy(image).astype(np.float64)
    if 'image_2' in photometric_keys and max_delta > 0:
        image_2 = photometric_distort_simple(image_2, max_delta, rs)

    if corners is None:
        if patch_size != w:
            pos_x = rs.randint(rho + patch_size // 2,
                               w - rho - patch_size // 2 + 1)
            pos_y = rs.randint(rho + patch_size // 2,
                               h - rho - patch_size // 2 + 1)
        else:
            pos_x, pos_y = w // 2, h // 2
        half = patch_size // 2
        corners = np.array([(pos_x - half, pos_y - half),
                            (pos_x + half, pos_y - half),
                            (pos_x + half, pos_y + half),
                            (pos_x - half, pos_y + half)])
    patch_1 = image_1[corners[0, 1]:corners[3, 1],
                      corners[0, 0]:corners[1, 0]]

    if delta is None:
        delta = rs.randint(-rho, rho, 8).reshape(4, 2)

    homography = solve_homography_4pt(
        corners.astype(np.float64), (corners + delta).astype(np.float64))
    image_2 = warp_image(image_2, homography, inverse=True)
    patch_2 = image_2[corners[0, 1]:corners[3, 1],
                      corners[0, 0]:corners[1, 0]]

    if target_gen == '4_points':
        target = delta
    elif target_gen == 'all_points':
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
        diff = (apply_homography(homography, pts) - pts).reshape(h, w, 2)
        target = diff[corners[0, 1]:corners[3, 1],
                      corners[0, 0]:corners[1, 0]]
    else:
        raise ValueError(target_gen)

    return {'image_1': image_1, 'image_2': image_2, 'patch_1': patch_1,
            'patch_2': patch_2, 'corners': corners, 'target': target,
            'delta': delta, 'homography': homography}


def to_grayscale(x: np.ndarray) -> np.ndarray:
    return (x[..., 0] * 0.299 + x[..., 1] * 0.587
            + x[..., 2] * 0.114)[..., None]


def standardize(x: np.ndarray, mean: float = 0.443,
                std: float = 0.129) -> np.ndarray:
    return (x.astype(np.float64) / 255.0 - mean) / std
