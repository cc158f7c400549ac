"""Deterministic synthetic image pools for benchmarks and smoke runs.

The reference trains on COCO images preprocessed offline to 320x240
(ref: src/data/coco/preprocess_offline.py). Real datasets are not present in
this environment, so benchmarks and end-to-end smoke tests draw from a
synthetic pool of smooth textured images (low-frequency noise mixtures) that
are meaningful warp targets — pure white noise would make photometric /
perceptual losses degenerate.
"""

from __future__ import annotations

import numpy as np


def make_image_pool(num_images: int, height: int = 240, width: int = 320,
                    seed: int = 0) -> np.ndarray:
    """[N,H,W,3] uint8 pool of smooth multi-scale textures."""
    rs = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    pool = np.empty((num_images, height, width, 3), dtype=np.uint8)
    for n in range(num_images):
        img = np.zeros((height, width, 3), dtype=np.float32)
        for c in range(3):
            acc = np.zeros((height, width), dtype=np.float32)
            for octave in range(4):
                fx = rs.uniform(0.01, 0.05) * (2 ** octave)
                fy = rs.uniform(0.01, 0.05) * (2 ** octave)
                phase_x = rs.uniform(0, 2 * np.pi)
                phase_y = rs.uniform(0, 2 * np.pi)
                amp = rs.uniform(0.3, 1.0) / (octave + 1)
                acc += amp * np.sin(fx * xs + phase_x) * np.cos(
                    fy * ys + phase_y)
            img[..., c] = acc
        img -= img.min()
        img /= max(img.max(), 1e-6)
        pool[n] = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return pool
