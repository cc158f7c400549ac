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
import numpy as np

from bihome_tpu.ops import color

Array = jax.Array

# The 6 channel permutations of ImageRandomLightingNoise
# (ref: src/data/transforms.py:250-262). numpy (not jnp) so importing this
# module never initializes the XLA backend — train.py --multihost must call
# jax.distributed.initialize() after imports, before any backend touch.
_PERMS = np.array([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                   [1, 2, 0], [2, 0, 1], [2, 1, 0]], dtype=np.int32)


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
    # Reuses c1_alpha for the trailing slot: exactly ONE of the two contrast
    # slots is active per sample (chain_coin gates them exclusively), so the
    # applied alpha is a single uniform(lower,upper) draw either way —
    # distributionally identical to a fresh draw. Keeping one draw also keeps
    # the PRNG stream layout stable for the numpy golden mirror
    # (data/numpy_ref.py). Do NOT "fix" this by drawing a second alpha
    # without updating numpy_ref and the datagen golden tests.
    image = image * jnp.where(c2_coin, c1_alpha, 1.0)

    # Lighting noise: random channel permutation (only when max_delta > 0,
    # which is statically true here).
    ln_key1, ln_key2 = jax.random.split(keys[10])
    ln_coin = jax.random.bernoulli(ln_key1)
    perm_idx = jax.random.randint(ln_key2, (), 0, 6)
    perm = jnp.asarray(_PERMS)[perm_idx]
    permuted = jnp.take(image, perm, axis=-1)
    return jnp.where(ln_coin, permuted, image)


def photometric_distort_full(image: Array, key: Array) -> Array:
    """The FULL SSD photometric chain with its fixed per-op parameters
    (ref: src/data/transforms.py:265-293): brightness delta 32,
    contrast/saturation alpha 0.5-1.5, hue +-18deg, channel permutation;
    the leading or trailing contrast slot is skipped per sample. This is
    the on-device equivalent of the dict-stage ``PhotometricDistort``
    config transform (distinct from PhotometricDistortSimple, whose
    strength is the single max_delta knob).

    image: one float [H,W,C] (grayscale C=1 passes through untouched by the
    color ops' definitions only if C==3; the reference indexes channels
    unconditionally, so C==3 is required — same constraint here).
    Use vmap for batches.
    """
    keys = jax.random.split(key, 11)

    b_coin = jax.random.bernoulli(keys[0])
    b_delta = jax.random.uniform(keys[1], (), minval=-32.0, maxval=32.0)
    image = image + jnp.where(b_coin, b_delta, 0.0)

    chain_coin = jax.random.bernoulli(keys[2])
    c1_coin = jax.random.bernoulli(keys[3]) & chain_coin
    c_alpha = jax.random.uniform(keys[4], (), minval=0.5, maxval=1.5)
    image = image * jnp.where(c1_coin, c_alpha, 1.0)

    hsv = color.rgb_to_hsv(image)
    s_coin = jax.random.bernoulli(keys[5])
    s_alpha = jax.random.uniform(keys[6], (), minval=0.5, maxval=1.5)
    h_coin = jax.random.bernoulli(keys[7])
    h_delta = jax.random.uniform(keys[8], (), minval=-18.0, maxval=18.0)
    h = hsv[..., 0] + jnp.where(h_coin, h_delta, 0.0)
    h = jnp.where(h > 360.0, h - 360.0, h)
    h = jnp.where(h < 0.0, h + 360.0, h)
    s = hsv[..., 1] * jnp.where(s_coin, s_alpha, 1.0)
    image = color.hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))

    c2_coin = jax.random.bernoulli(keys[9]) & (~chain_coin)
    # Single alpha draw shared by the two exclusive contrast slots — see the
    # equivalence note in photometric_distort_simple.
    image = image * jnp.where(c2_coin, c_alpha, 1.0)

    ln_key1, ln_key2 = jax.random.split(keys[10])
    ln_coin = jax.random.bernoulli(ln_key1)
    perm_idx = jax.random.randint(ln_key2, (), 0, 6)
    permuted = jnp.take(image, jnp.asarray(_PERMS)[perm_idx], axis=-1)
    return jnp.where(ln_coin, permuted, image)
