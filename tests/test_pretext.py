"""Pretext distillation targets (tools/pretrain_aux.py) spec tests.

The flagship training demo rests on these target properties; lock them:
  * shapes: [B,32,32,64] at patch 128, values in (-1,1) via tanh,
  * grad targets respond to spatial content (non-constant),
  * gradpi targets are invariant to the brightness/contrast jitter family
    they are trained against (exactly: offsets die in Sobel, scales die in
    the per-sample normalization)."""

import numpy as np
import jax.numpy as jnp

import pytest

tools = pytest.importorskip('tools.pretrain_aux')


def _patches(b=2, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(b, 128, 128, 1).astype(np.float32)
    # Add smooth structure so gradients are non-trivial.
    yy, xx = np.mgrid[0:128, 0:128] / 128.0
    return jnp.asarray(base * 0.2 + np.sin(6 * xx + 4 * yy)[None, ..., None])


def test_grad_targets_shape_and_range():
    t = tools.grad_targets(_patches())
    assert t.shape == (2, 32, 32, 64)
    assert float(jnp.max(jnp.abs(t))) < 1.0
    assert float(jnp.std(t)) > 1e-3      # not collapsed


def test_grad_targets_layer2_geometry():
    """--layers 2 trains a stride-8, 128-ch extractor (resnet34 layer2
    truncation, models/resnet.py): the distill targets must match that
    feature geometry, and the pi variant likewise."""
    x = _patches()
    t = tools.grad_targets(x, stride=8, out_dim=128)
    assert t.shape == (2, 16, 16, 128)
    assert float(jnp.max(jnp.abs(t))) < 1.0
    assert float(jnp.std(t)) > 1e-3
    tpi = tools.grad_targets_pi(x, stride=8, out_dim=128)
    assert tpi.shape == (2, 16, 16, 128)
    # Photometric invariance is preserved at the deeper geometry.
    tpi2 = tools.grad_targets_pi(1.3 * (x + 0.4), stride=8, out_dim=128)
    assert float(jnp.max(jnp.abs(tpi2 - tpi))) < 1e-2


def test_grad_targets_rich_raises_rank():
    """--rich_target's claim: the diagonal-derivative + Laplacian channels
    raise the target's effective rank (the distill-only extractor's MACE
    floor tracked target rank — BENCH_NOTES.md). Lock shape-compat (same
    64-dim projected space) and a higher entropy effective rank on
    natural-statistics crops (the pretext's actual training data — the
    tanh-projected space is intensity-dominated, so the entropy rank is
    small in absolute terms for both; the RELATIVE increase is the claim)."""
    from bihome_tpu.data import synthetic
    imgs = synthetic.make_image_pool(4, 240, 320, seed=2).astype(np.float32)
    x = jnp.asarray(imgs[:, :128, :128, :1] / 255.0)
    t12 = tools.grad_targets(x)
    t24 = tools.grad_targets(x, rich=True)
    assert t24.shape == t12.shape == (4, 32, 32, 64)
    assert float(jnp.max(jnp.abs(t24 - t12))) > 1e-3   # actually different

    def erank(t):
        m = np.asarray(t, np.float64).reshape(-1, 64)
        m -= m.mean(0)
        s = np.linalg.svd(m, compute_uv=False)
        p = (s ** 2) / (s ** 2).sum()
        return float(np.exp(-(p * np.log(p + 1e-12)).sum()))

    assert erank(t24) > erank(t12) + 0.3


def test_warp_gt_identity_and_alignment():
    """warp_gt(patch_1, gt delta) must align patch_1 to patch_2 — the
    property the dense-correspondence InfoNCE positives rest on (the head
    warps patch_1 by delta_hat and compares against patch_2,
    heads/assembled.py:_multihead_loss/_triplet_resnet_loss)."""
    import jax
    from bihome_tpu.data import pipeline
    x = _patches(b=2)
    # delta = 0: identity warp, full interior support.
    w, m = tools.warp_gt(x, jnp.zeros((2, 4, 2)))
    np.testing.assert_allclose(np.asarray(w), np.asarray(x), atol=1e-4)
    assert float(jnp.min(m[:, 1:-1, 1:-1])) == 1.0
    # real generated pair on the natural-statistics pool (the pretext's
    # actual training data): gt-warp must align patch_1 to patch_2 far
    # better than no warp, where the warp support is full.
    from bihome_tpu.data import synthetic
    spec = pipeline.PairSpec(rho=16, patch_size=128, photometric_keys=(),
                             max_delta=0.0)
    imgs = jnp.asarray(synthetic.make_image_pool(2, 240, 320, seed=3)
                       ).astype(jnp.float32)
    batch = pipeline.generate_pairs(imgs, jax.random.PRNGKey(0), spec)
    w1, mask = tools.warp_gt(batch['patch_1'], batch['delta'])
    full = mask[..., 0] > 0.999
    err_aligned = jnp.sum(jnp.abs(w1 - batch['patch_2'])[..., 0] * full) \
        / jnp.sum(full)
    err_unaligned = jnp.sum(
        jnp.abs(batch['patch_1'] - batch['patch_2'])[..., 0] * full) \
        / jnp.sum(full)
    assert float(err_aligned) < 0.5 * float(err_unaligned)


def test_dense_infonce_identity_vs_shuffled():
    """Aligned identical features -> near-perfect accuracy and low loss;
    spatially shuffled features -> chance accuracy."""
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    valid = jnp.ones((2, 16, 16))
    loss_id, acc_id = tools.dense_infonce(f, f, valid, tau=0.15, rex=2)
    assert float(acc_id) > 0.95
    perm = rng.permutation(16 * 16)
    f_shuf = f.reshape(2, 256, 8)[:, perm].reshape(2, 16, 16, 8)
    loss_sh, acc_sh = tools.dense_infonce(f, f_shuf, valid, tau=0.15, rex=2)
    assert float(acc_sh) < 0.1
    assert float(loss_id) < float(loss_sh)


def test_dense_infonce_masks_invalid_anchors():
    """Anchors without full warp support must not contribute: zeroing the
    features at invalid positions must not change the loss."""
    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    f2 = f1 + 0.01 * jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    valid = jnp.ones((1, 8, 8)).at[:, :2, :].set(0.0)
    l_a, _ = tools.dense_infonce(f1, f2, valid)
    f1z = f1.at[:, :2, :, :].set(123.0)
    l_b, _ = tools.dense_infonce(f1z, f2, valid)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-5)


def test_gradpi_invariant_to_brightness_contrast():
    x = _patches()
    t0 = tools.grad_targets_pi(x)
    t1 = tools.grad_targets_pi(1.3 * (x + 0.4))
    # offsets cancel exactly (edge-replicate pads); contrast leaves only
    # the normalization-epsilon residual (~6e-4)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=0, atol=2e-3)
    # plain grad targets are NOT invariant (sanity of the distinction)
    g0, g1 = tools.grad_targets(x), tools.grad_targets(1.3 * (x + 0.4))
    assert float(jnp.max(jnp.abs(g0 - g1))) > 1e-2


def test_basin_ratio_orders_misalignment():
    """--basin_weight's ratio term: positive when the perturbed view is
    farther from f2 than the aligned view, zero at equality, negative when
    inverted; masked positions must not contribute."""
    rng = np.random.RandomState(0)
    f2 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    near = f2 + 0.01 * jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    far = f2 + 0.30 * jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    v = jnp.ones((2, 8, 8))
    r_good = float(tools.basin_ratio(near, far, f2, v, v))
    r_flat = float(tools.basin_ratio(near, near, f2, v, v))
    r_bad = float(tools.basin_ratio(far, near, f2, v, v))
    assert r_good > 0.5
    assert abs(r_flat) < 1e-5
    assert r_bad < -0.5
    # Invalid positions are excluded: corrupting them changes nothing.
    ve = jnp.ones((2, 8, 8)).at[:, :3, :].set(0.0)
    r_m = float(tools.basin_ratio(near, far, f2, v, ve))
    far_c = far.at[:, :3, :, :].set(1e3)
    near_c = near.at[:, :3, :, :].set(-1e3)
    r_mc = float(tools.basin_ratio(near_c, far_c, f2, v, ve))
    np.testing.assert_allclose(r_m, r_mc, rtol=1e-5)


def test_dense_infonce_rex0_penalizes_neighbor_confusion():
    """The fine (rex=0) term must keep immediate neighbors in the
    negatives: on a spatially SMOOTH feature map (neighbors nearly
    identical) rex=0 loss is strictly higher than rex=2 loss, because the
    positive now competes with its look-alike neighbors. On spatially
    white features the two agree to within the negative-count difference.
    This is the property --cl_fine_weight buys (sub-cell sharpening)."""
    rng = np.random.RandomState(0)
    white = rng.randn(1, 16, 16, 8).astype(np.float32)

    def blur(x):  # wrap-pad 3x3 box blur: locally smooth, globally distinct
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='wrap')
        return sum(xp[:, i:i + 16, j:j + 16]
                   for i in range(3) for j in range(3)) / 9.0

    smooth = white
    for _ in range(3):
        smooth = blur(smooth)
    f = jnp.asarray(smooth)
    valid = jnp.ones((1, 16, 16))
    l_broad, _ = tools.dense_infonce(f, f, valid, tau=0.15, rex=2)
    l_fine, _ = tools.dense_infonce(f, f, valid, tau=0.15, rex=0)
    assert float(l_fine) > float(l_broad) + 0.4

    w = jnp.asarray(white)
    lw_b, acc_b = tools.dense_infonce(w, w, valid, tau=0.15, rex=2)
    lw_f, acc_f = tools.dense_infonce(w, w, valid, tau=0.15, rex=0)
    assert float(acc_f) > 0.95 and float(acc_b) > 0.95
    assert abs(float(lw_f) - float(lw_b)) < 0.15


def test_dense_infonce_hard_beta_limit_and_ordering():
    """--cl_hard_beta spec: (a) beta -> 0+ reproduces the uniform objective
    exactly (the log-space identity log N + lse((1+b)s) - lse(b*s) reduces
    to lse(s) at b=0); (b) positive beta upweights hard negatives, so when
    one negative is nearly as similar as the positive the hard-weighted
    loss must exceed the uniform loss (the partition function concentrates
    on the confuser)."""
    rng = np.random.RandomState(3)
    f1 = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    f2 = f1 + 0.3 * jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    valid = jnp.ones((2, 8, 8))

    l0, a0 = tools.dense_infonce(f1, f2, valid, tau=0.2, rex=1,
                                 hard_beta=0.0)
    l_eps, a_eps = tools.dense_infonce(f1, f2, valid, tau=0.2, rex=1,
                                       hard_beta=1e-7)
    np.testing.assert_allclose(float(l0), float(l_eps), rtol=1e-4)
    np.testing.assert_allclose(float(a0), float(a_eps), rtol=1e-6)

    # Plant a confuser: copy a far-away position's feature almost onto
    # every anchor's positive (hard negative everywhere).
    f2_hard = f2.reshape(2, 64, 16)
    f2_hard = f2_hard.at[:, 40].set(f2_hard[:, 10] * 1.02)
    f2_hard = f2_hard.reshape(2, 8, 8, 16)
    lu, _ = tools.dense_infonce(f1, f2_hard, valid, tau=0.2, rex=1,
                                hard_beta=0.0)
    lh, _ = tools.dense_infonce(f1, f2_hard, valid, tau=0.2, rex=1,
                                hard_beta=1.0)
    assert float(lh) > float(lu)
