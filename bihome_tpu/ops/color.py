"""Color-space ops matching cv2 float conventions, in jnp.

The reference's photometric distortion converts float RGB to HSV with cv2
(H in degrees [0,360), S in [0,1], V = max-channel in input units;
ref: src/data/transforms.py:175-193) and back. These are the TPU-native
equivalents; they operate on arbitrary float ranges (the reference applies
brightness/contrast BEFORE the HSV round trip, so values may leave [0,255]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rgb_to_hsv(rgb: Array) -> Array:
    """[..., 3] float RGB -> HSV with H in [0,360), S in [0,1], V = max.

    cv2 float convention (COLOR_RGB2HSV on float32 input).
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    h_r = 60.0 * (g - b) / safe_delta
    h_g = 120.0 + 60.0 * (b - r) / safe_delta
    h_b = 240.0 + 60.0 * (r - g) / safe_delta
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(delta == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h)
    safe_v = jnp.where(v == 0, 1.0, v)
    s = jnp.where(v == 0, 0.0, delta / safe_v)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: Array) -> Array:
    """Inverse of :func:`rgb_to_hsv` (cv2 float COLOR_HSV2RGB convention)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h60 = h / 60.0
    i = jnp.floor(h60)
    f = h60 - i
    i = jnp.mod(i.astype(jnp.int32), 6)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_grayscale(rgb: Array, keepdims: bool = True) -> Array:
    """Luma grayscale with the reference weights .299/.587/.114
    (ref: src/data/transforms.py:333-354)."""
    gray = (rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114)
    return gray[..., None] if keepdims else gray


def standardize(x: Array, mean: float, std: float) -> Array:
    """(x/255 - mean) / std (ref: src/data/transforms.py:357-378)."""
    return (x.astype(jnp.float32) / 255.0 - mean) / std


def destandardize(x: Array, mean: float = 0.443, std: float = 0.129) -> Array:
    """Inverse of :func:`standardize`, clipped to [0,255]
    (ref: eval.py:31-41)."""
    out = (x * std + mean) * 255.0
    return jnp.clip(jnp.rint(out), 0.0, 255.0)
