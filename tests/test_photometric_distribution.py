"""Distributional parity of the jnp photometric augmentation vs the numpy
mirror of the reference chain (SURVEY §7 hard part 3: bit-parity with
np.random.RandomState is impossible across PRNGs; parity is distributional).
"""

import numpy as np
import jax
import jax.numpy as jnp

from bihome_tpu.data import numpy_ref, photometric


def _stats(outs, base):
    """Per-sample mean pixel shift and contrast ratio."""
    shifts = np.array([float(np.mean(o - base)) for o in outs])
    spreads = np.array([float(np.std(o) / max(np.std(base), 1e-6))
                        for o in outs])
    changed = np.array([float(np.mean(np.abs(o - base) > 0.5))
                        for o in outs])
    return shifts, spreads, changed


def test_photometric_distribution_matches_numpy_reference():
    rs = np.random.RandomState(0)
    base = rs.uniform(30, 220, (24, 32, 3)).astype(np.float32)
    n = 300
    max_delta = 32.0

    jnp_outs = []
    base_j = jnp.asarray(base)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    distort = jax.jit(photometric.photometric_distort_simple,
                      static_argnums=2)
    for i in range(n):
        jnp_outs.append(np.asarray(distort(base_j, keys[i], max_delta)))

    np_rs = np.random.RandomState(1)
    np_outs = [numpy_ref.photometric_distort_simple(base, max_delta, np_rs)
               for _ in range(n)]

    js, jc, jch = _stats(jnp_outs, base)
    ns_, nc, nch = _stats(np_outs, base)

    # Brightness: mean shift is symmetric around 0 with similar spread
    # (coin * uniform(-32,32) -> std ≈ 32/sqrt(3)/sqrt(2) plus channel perm
    # and contrast interactions).
    assert abs(js.mean() - ns_.mean()) < 4.0, (js.mean(), ns_.mean())
    assert abs(js.std() - ns_.std()) < 0.25 * max(js.std(), ns_.std())
    # Contrast spread ratio distributions align.
    assert abs(jc.mean() - nc.mean()) < 0.08, (jc.mean(), nc.mean())
    assert abs(jc.std() - nc.std()) < 0.3 * max(jc.std(), nc.std())
    # Fraction of samples visibly changed (any op fired) is similar.
    assert abs(jch.mean() - nch.mean()) < 0.1, (jch.mean(), nch.mean())


def test_delta_and_position_distributions():
    """delta ~ randint(-rho, rho) and patch centers uniform within margins
    (ref: transforms.py:504-538)."""
    from bihome_tpu.data import pipeline
    spec = pipeline.PairSpec(rho=8, patch_size=32, photometric_keys=(),
                             max_delta=0.0, grayscale_keys=(),
                             standardize_keys=())
    imgs = jnp.zeros((64, 60, 80, 3))
    deltas = []
    corners = []
    for s in range(30):
        b = pipeline.generate_pairs(imgs, jax.random.PRNGKey(s), spec)
        deltas.append(np.asarray(b['delta']))
        corners.append(np.asarray(b['corners']))
    d = np.concatenate(deltas).ravel()
    assert d.min() == -8 and d.max() == 7  # randint high-exclusive
    # Near-uniform over [-8, 7]: each value ~1/16 of mass.
    hist = np.histogram(d, bins=np.arange(-8.5, 8.5))[0] / d.size
    assert np.all(np.abs(hist - 1 / 16) < 0.012), hist
    c = np.concatenate(corners)
    x0 = c[:, 0, 0]
    y0 = c[:, 0, 1]
    assert x0.min() >= 8 and x0.max() <= 80 - 8 - 32
    assert y0.min() >= 8 and y0.max() <= 60 - 8 - 32
    # Centers span the full legal range.
    assert x0.max() - x0.min() >= 0.9 * (80 - 2 * 8 - 32)
