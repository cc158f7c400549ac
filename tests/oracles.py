"""Independent pure-numpy/torch oracles for geometry tests.

Written directly from the mathematical definitions (NOT ports of any library
implementation) so they give an independent check of the jnp geometry core.
cv2/kornia are not available in this environment; torch (CPU) grid_sample is
used as a second independent oracle for the bilinear warp.
"""

import numpy as np


def solve_homography_4pt(src, dst):
    """Exact 4-point homography in float64 by direct 8x8 solve.

    src, dst: [4,2]. Returns H [3,3] with H @ [x,y,1] ∝ [u,v,1].
    """
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


def apply_homography(h, pts):
    """pts [N,2] -> transformed [N,2] in float64."""
    pts_h = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    out = pts_h @ h.T
    return out[:, :2] / out[:, 2:3]


def warp_image_loop(image, sampling_h, target_hw):
    """Reference warp: dst(x,y) = bilinear(src, S @ (x,y,1)), zeros outside.

    Naive double loop in float64 — slow, only for tiny test images.
    image: [H,W,C]; sampling_h: [3,3] (dst coords -> src coords).
    """
    th, tw = target_hw
    h, w, c = image.shape
    out = np.zeros((th, tw, c), dtype=np.float64)
    for yy in range(th):
        for xx in range(tw):
            p = sampling_h @ np.array([xx, yy, 1.0])
            u, v = p[0] / p[2], p[1] / p[2]
            x0, y0 = int(np.floor(u)), int(np.floor(v))
            fx, fy = u - x0, v - y0
            acc = np.zeros(c)
            for (yi, xi, wgt) in [(y0, x0, (1 - fy) * (1 - fx)),
                                  (y0, x0 + 1, (1 - fy) * fx),
                                  (y0 + 1, x0, fy * (1 - fx)),
                                  (y0 + 1, x0 + 1, fy * fx)]:
                if 0 <= yi < h and 0 <= xi < w:
                    acc += wgt * image[yi, xi]
            out[yy, xx] = acc
    return out


def warp_image_torch(image, sampling_h, target_hw):
    """Warp via torch grid_sample(align_corners=True), zeros padding.

    Same semantics as the loop oracle; independent implementation path.
    image: [H,W,C] numpy; sampling_h: dst->src coords. Returns [th,tw,C].
    """
    import torch
    import torch.nn.functional as F

    th, tw = target_hw
    h, w, _ = image.shape
    ys, xs = np.mgrid[0:th, 0:tw].astype(np.float64)
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones], axis=0).reshape(3, -1)
    mapped = sampling_h @ pts
    u = mapped[0] / mapped[2]
    v = mapped[1] / mapped[2]
    # Normalize to [-1,1] with align_corners=True convention.
    gx = 2.0 * u / (w - 1) - 1.0
    gy = 2.0 * v / (h - 1) - 1.0
    grid = torch.from_numpy(
        np.stack([gx, gy], axis=-1).reshape(1, th, tw, 2)).float()
    img_t = torch.from_numpy(
        image.astype(np.float32)).permute(2, 0, 1).unsqueeze(0)
    out = F.grid_sample(img_t, grid, mode='bilinear', padding_mode='zeros',
                        align_corners=True)
    return out[0].permute(1, 2, 0).numpy()
