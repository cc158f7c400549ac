"""Blob occlusion augmentation (the reference's porespy-based collator).

Equivalent of ``CollatorWithBlobs`` (ref: src/data/transforms.py:746-799):
for each sample, composite binary blobs cut from ANOTHER sample's patch_1
into its patch_2 — an occlusion/content-change augmentation enabled by the
config keys DATA.AUGMENT_BLOB_POROSITY / DATA.AUGMENT_BLOBINESS
(ref: train.py:574-577). In the reference the porespy import is commented
out, so the shipped path would NameError; here it is functional.

``porespy.generators.blobs`` = gaussian-filtered white noise thresholded at
the porosity quantile; we reproduce that definition directly in jnp (FFT-free
separable gaussian blur), jit/vmap-friendly so the augmentation runs inside
the fused datagen step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _gaussian_kernel(sigma: float, radius: int) -> Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def generate_blobs(key: Array, shape: Tuple[int, int],
                   porosity: float = 0.5, blobiness: float = 1.0) -> Array:
    """Binary blob mask [H,W] with ~``porosity`` fraction of True.

    porespy semantics: sigma = mean(shape)/(40·blobiness); noise -> gaussian
    blur -> normalize -> threshold at the porosity percentile.
    """
    h, w = shape
    sigma = float((h + w) / 2.0) / (40.0 * float(blobiness))
    radius = max(1, int(4 * sigma))
    noise = jax.random.normal(key, (h, w), jnp.float32)
    k = _gaussian_kernel(sigma, radius)
    x = jnp.pad(noise, ((radius, radius), (0, 0)), mode='edge')
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode='valid'),
                 in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (radius, radius)), mode='edge')
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode='valid'))(x)
    threshold = jnp.percentile(x, 100.0 * porosity)
    return x < threshold


def apply_blob_augmentation(batch: Dict[str, Array], key: Array,
                            patch_1_key: str = 'patch_1',
                            patch_2_key: str = 'patch_2',
                            porosity: float = 0.5,
                            blobiness: float = 1.0) -> Dict[str, Array]:
    """Composite blobs from a (cyclically) different sample's patch_1 into
    each patch_2 (ref: transforms.py:777-798 picks a random other index; we
    use a random cyclic shift — identical marginal distribution, static
    shapes under jit)."""
    p1 = batch[patch_1_key]
    p2 = batch[patch_2_key]
    b, h, w, _ = p2.shape
    k_shift, k_blobs = jax.random.split(key)
    shift = jax.random.randint(k_shift, (), 1, b)
    donors = jnp.roll(p1, shift, axis=0)
    masks = jax.vmap(lambda kk: generate_blobs(kk, (h, w), porosity,
                                               blobiness))(
        jax.random.split(k_blobs, b))                     # [B,H,W] bool
    masks = masks[..., None]
    out = dict(batch)
    out[patch_2_key] = jnp.where(masks, donors, p2)
    return out
