"""Vectorized photometric distortion (PDS augmentation) in jnp.

TPU-native equivalent of ``PhotometricDistortSimple``
(ref: src/data/transforms.py:296-330): per-image random brightness, a
contrast/saturation/hue chain in which either the leading or the trailing
contrast op is skipped, and a random channel permutation. Every random
decision of the reference (coin flips + uniform draws) has a jax.random
counterpart; all branching is ``where``-based so the whole thing jits and
vmaps. Values are intentionally NOT clipped, matching the reference (the
float image may leave [0,255] and is consumed downstream as-is).

``max_delta`` parameterizes strength: 0 = S-COCO (no-op), 32 = PDS-COCO
(ref: BASELINE.md, config diff s-coco vs pds-coco).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bihome_tpu.ops import color

Array = jax.Array

# The 6 channel permutations of ImageRandomLightingNoise
# (ref: src/data/transforms.py:250-262).
_PERMS = jnp.array([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                    [1, 2, 0], [2, 0, 1], [2, 1, 0]], dtype=jnp.int32)


def photometric_distort_simple(image: Array, key: Array,
                               max_delta: float) -> Array:
    """Distort one float image [H,W,3]. Use vmap for batches.

    Matches the randomized op order of the reference:
      brightness -> (contrast?) -> HSV -> saturation -> hue -> RGB
      -> (contrast?) -> channel permutation,
    where exactly one of the two contrast slots is active per sample
    (ref: src/data/transforms.py:317-330).
    """
    if max_delta <= 0:
        # S-COCO: every random op degenerates to identity (uniform(0,0) etc.);
        # the reference's float HSV round-trip is a mathematical no-op, so we
        # skip it entirely.
        return image

    lower = 1.0 - max_delta / 32.0 * 0.5
    upper = 1.0 + max_delta / 32.0 * 0.5
    keys = jax.random.split(key, 11)

    # Brightness: coin + uniform(-max_delta, max_delta).
    b_coin = jax.random.bernoulli(keys[0])
    b_delta = jax.random.uniform(keys[1], (), minval=-max_delta,
                                 maxval=max_delta)
    image = image + jnp.where(b_coin, b_delta, 0.0)

    # Which contrast slot is active: chain_coin=1 -> leading, else trailing.
    chain_coin = jax.random.bernoulli(keys[2])

    c1_coin = jax.random.bernoulli(keys[3]) & chain_coin
    c1_alpha = jax.random.uniform(keys[4], (), minval=lower, maxval=upper)
    image = image * jnp.where(c1_coin, c1_alpha, 1.0)

    hsv = color.rgb_to_hsv(image)
    s_coin = jax.random.bernoulli(keys[5])
    s_alpha = jax.random.uniform(keys[6], (), minval=lower, maxval=upper)
    h_coin = jax.random.bernoulli(keys[7])
    h_delta = jax.random.uniform(keys[8], (), minval=-max_delta / 2.0,
                                 maxval=max_delta / 2.0)
    h = hsv[..., 0] + jnp.where(h_coin, h_delta, 0.0)
    # Reference wraps once: >360 -> -360, <0 -> +360.
    h = jnp.where(h > 360.0, h - 360.0, h)
    h = jnp.where(h < 0.0, h + 360.0, h)
    s = hsv[..., 1] * jnp.where(s_coin, s_alpha, 1.0)
    image = color.hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))

    c2_coin = jax.random.bernoulli(keys[9]) & (~chain_coin)
    image = image * jnp.where(c2_coin, c1_alpha, 1.0)

    # Lighting noise: random channel permutation (only when max_delta > 0,
    # which is statically true here).
    ln_key1, ln_key2 = jax.random.split(keys[10])
    ln_coin = jax.random.bernoulli(ln_key1)
    perm_idx = jax.random.randint(ln_key2, (), 0, 6)
    perm = _PERMS[perm_idx]
    permuted = jnp.take(image, perm, axis=-1)
    return jnp.where(ln_coin, permuted, image)
