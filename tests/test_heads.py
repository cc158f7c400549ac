"""Head / loss tests over all four head families (SURVEY §4c).

Small shapes (patch 32, resnet18 aux where possible is not allowed — config
uses resnet34; we keep resnet34 but 32px patches) for 1-core CPU tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bihome_tpu import geometry
from bihome_tpu.data import pipeline, synthetic
from bihome_tpu.heads import AssembledModel, HeadConfig
from bihome_tpu.heads import ransac as ransac_lib
from bihome_tpu.models import backbones
from bihome_tpu.training import losses

PS = 32


def make_batch(batch=2, seed=0, target_gen='4_points', emit_images=()):
    imgs = jnp.array(synthetic.make_image_pool(batch, 60, 80, seed=seed),
                     jnp.float32)
    spec = pipeline.PairSpec(
        rho=8, patch_size=PS, photometric_keys=(), max_delta=0.0,
        target_gen=target_gen,
        grayscale_keys=('patch_1', 'patch_2') + tuple(
            k for k in emit_images if k == 'image_1'),
        standardize_keys=('patch_1', 'patch_2') + tuple(
            k for k in emit_images if k == 'image_1'),
        emit_images=tuple(emit_images))
    return pipeline.generate_pairs(imgs, jax.random.PRNGKey(seed), spec)


class TestNoOpHead:
    def test_supervised_mse_4points(self):
        batch = make_batch()
        backbone = backbones.ResNet34Backbone(variant='oneline')
        head = HeadConfig(name='NoOpHead', target_gen='4_points',
                          learning_keys=('delta', 'delta_hat_12', 'delta',
                                         'delta_hat_12'), patch_size=PS)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch)
        loss = losses.compute_loss('MSELoss', out)
        assert np.isfinite(float(loss))
        assert out['delta_hat'].shape == (2, 4, 2)
        # delta_gt passthrough
        np.testing.assert_array_equal(np.asarray(out['delta_gt']),
                                      np.asarray(batch['delta']))

    def test_all_points_corner_extraction_and_l1(self):
        batch = make_batch(target_gen='all_points')
        backbone = backbones.RethinkingBackbone(
            variant='oneline', target_keys=('pf_hat_12',))
        head = HeadConfig(name='NoOpHead', target_gen='all_points',
                          learning_keys=('target', 'pf_hat_12', 'delta',
                                         'pf_hat_12'), patch_size=PS)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch)
        loss = losses.compute_loss('L1Loss', out)
        assert np.isfinite(float(loss))
        pf = np.asarray(model.apply(variables, batch)['network_output'])
        dh = np.asarray(out['delta_hat'])
        np.testing.assert_allclose(dh[:, 0], pf[:, 0, 0], atol=1e-6)
        np.testing.assert_allclose(dh[:, 2], pf[:, PS - 1, PS - 1], atol=1e-6)

    def test_predict_4points(self):
        batch = make_batch()
        backbone = backbones.ResNet34Backbone(variant='oneline')
        head = HeadConfig(name='NoOpHead', target_gen='4_points',
                          learning_keys=('delta', 'delta_hat_12', 'delta',
                                         'delta_hat_12'), patch_size=PS)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)
        delta_hat, hom = model.apply(variables, batch, method='predict')
        assert delta_hat.shape == (2, 4, 2)
        assert hom.shape == (2, 3, 3)


class TestRansacPostprocess:
    def test_recovers_clean_field(self):
        # A clean PF generated from a known homography must be recovered.
        corners = geometry.image_corners(PS, PS, batch_size=2)
        delta = jnp.array(np.random.RandomState(0).randint(-6, 6, (2, 4, 2)),
                          jnp.float32)
        h_true = geometry.four_point_to_homography(corners, delta)
        ys, xs = jnp.meshgrid(jnp.arange(PS, dtype=jnp.float32),
                              jnp.arange(PS, dtype=jnp.float32),
                              indexing='ij')
        pts = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
        pts = jnp.broadcast_to(pts[None], (2, PS * PS, 2))
        pf = (geometry.transform_points(h_true, pts) - pts).reshape(
            2, PS, PS, 2)
        delta_fit, _ = ransac_lib.perspective_field_to_delta(
            pf, jax.random.PRNGKey(0), num_hypotheses=32)
        np.testing.assert_allclose(np.asarray(delta_fit), np.asarray(delta),
                                   atol=0.05)

    def test_robust_to_outliers(self):
        corners = geometry.image_corners(PS, PS, batch_size=1)
        delta = jnp.array([[[3., -2], [1, 4], [-5, 2], [0, -3]]])
        h_true = geometry.four_point_to_homography(corners, delta)
        ys, xs = jnp.meshgrid(jnp.arange(PS, dtype=jnp.float32),
                              jnp.arange(PS, dtype=jnp.float32),
                              indexing='ij')
        pts = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)[None]
        pf = (geometry.transform_points(h_true, pts) - pts)
        pf = pf.at[0, :100].add(300.0)  # ~10% gross outliers
        pf = pf.reshape(1, PS, PS, 2)
        delta_fit, _ = ransac_lib.perspective_field_to_delta(
            pf, jax.random.PRNGKey(1), num_hypotheses=64)
        np.testing.assert_allclose(np.asarray(delta_fit), np.asarray(delta),
                                   atol=0.5)


class TestPhotometricHead:
    def test_loss_and_gt_patch_recovery(self):
        batch = make_batch(emit_images=('image_1',))
        backbone = backbones.ResNet34Backbone(variant='oneline')
        head = HeadConfig(name='PhotometricHead',
                          learning_keys=('patch_2', 'image_1', 'delta',
                                         'delta_hat_12'), patch_size=PS)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch)
        assert out['network_output'].shape == out['ground_truth'].shape
        loss = losses.compute_loss('L1Loss', out)
        assert np.isfinite(float(loss))
        # Oracle property: warping image_1 with the TRUE delta reproduces
        # patch_2 (up to photometric noise; none here) — so the photometric
        # loss evaluated at delta_hat == delta_gt must be near zero.
        batch2 = dict(batch)
        outputs = {'delta_hat_12': batch['delta']}
        data = {**batch2, **outputs}
        h = geometry.four_point_to_homography(data['corners'],
                                              data['delta'])
        # reuse model internals through apply with a patched backbone output:
        # simplest: compute loss directly via the head formulas
        ps = PS
        corners0 = data['corners'][:, 0]
        ys, xs = jnp.meshgrid(jnp.arange(ps, dtype=jnp.float32),
                              jnp.arange(ps, dtype=jnp.float32),
                              indexing='ij')

        def one(img, h_mat, c0):
            xa = xs.reshape(-1) + c0[0]
            ya = ys.reshape(-1) + c0[1]
            pts = jnp.stack([xa, ya, jnp.ones_like(xa)], 0)
            m = h_mat @ pts
            return geometry.bilinear_sample(
                img, m[0] / m[2], m[1] / m[2]).reshape(ps, ps, -1)

        patch_hat = jax.vmap(one)(data['image_1'], h, corners0)
        err = np.abs(np.asarray(patch_hat) - np.asarray(data['patch_2']))
        # interior only (border pixels sample zero-padded territory)
        assert np.median(err[:, 4:-4, 4:-4]) < 0.05


class TestTripletHead:
    @pytest.mark.slow
    def test_zhang_loss_runs_and_grads(self):
        batch = make_batch()
        backbone = backbones.ContentAwareBackbone(
            variant='doubleline', fix_mask=True,
            target_keys=('delta_hat_12', 'delta_hat_21'))
        head = HeadConfig(name='TripletHead', variant='doubleline',
                          patch_keys=('patch_1', 'patch_2'),
                          mask_keys=('mask_1', 'mask_2'),
                          feature_keys=('feature_1', 'feature_2'),
                          target_keys=('delta_hat_12', 'delta_hat_21'),
                          triplet_margin=1.0,
                          triplet_aggregation='channel-agnostic',
                          ld=2, mu=0.01, patch_size=PS)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch)
        assert np.isfinite(float(out['loss']))
        assert 'loss_comp/ln3' in out['metrics']

        def loss_fn(params):
            o = model.apply({**variables, 'params': params}, batch)
            return o['loss']

        g = jax.grad(loss_fn)(variables['params'])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0.0

    def test_fix_mask_closed_form_matches_warped_ones(self):
        """FIX_MASK fast path: the closed-form support mask
        (geometry.ones_warp_mask) must reproduce the generic path that
        tent-warps the all-ones mask tensor — loss AND gradients."""
        import os
        batch = make_batch()
        backbone = backbones.ContentAwareBackbone(
            variant='doubleline', fix_mask=True,
            target_keys=('delta_hat_12', 'delta_hat_21'))
        head = HeadConfig(name='TripletHead', variant='doubleline',
                          patch_keys=('patch_1', 'patch_2'),
                          mask_keys=('mask_1', 'mask_2'),
                          feature_keys=('feature_1', 'feature_2'),
                          target_keys=('delta_hat_12', 'delta_hat_21'),
                          triplet_margin=1.0,
                          triplet_aggregation='channel-agnostic',
                          ld=2, mu=0.01, patch_size=PS)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)

        def run():
            def loss_fn(params):
                o = model.apply({**variables, 'params': params}, batch)
                return o['loss']
            val, grads = jax.value_and_grad(loss_fn)(variables['params'])
            return float(val), jax.tree.map(np.asarray, grads)

        try:
            os.environ['BIHOME_TRIPLET_MASK'] = 'warp'
            want_val, want_g = run()
        finally:
            os.environ.pop('BIHOME_TRIPLET_MASK', None)
        got_val, got_g = run()
        assert got_val == pytest.approx(want_val, rel=1e-5)
        flat_w = jax.tree_util.tree_leaves(want_g)
        flat_g = jax.tree_util.tree_leaves(got_g)
        for a, b in zip(flat_g, flat_w):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestPerceptualHead:
    def _bihome_config(self, **kw):
        base = dict(name='PerceptualHead', patch_size=PS,
                    patch_keys=('patch_1', 'patch_2'),
                    delta_hat_keys=('delta_hat_12', 'delta_hat_21'),
                    pf_keys=(), auxiliary_resnet='resnet34',
                    auxiliary_resnet_output_layer=1,
                    triplet_loss='double-line',
                    triplet_aggregation='channel-agnostic',
                    triplet_margin='inf', triplet_distance='l1',
                    triplet_mu=0.01, mask_keys=(),
                    sampling_strategy='downsample-mask')
        base.update(kw)
        return HeadConfig(**base)

    @pytest.mark.slow
    def test_bihome_delta_mode_loss_and_freeze_semantics(self):
        batch = make_batch()
        backbone = backbones.ResNet34Backbone(
            variant='doubleline',
            target_keys=('delta_hat_12', 'delta_hat_21'))
        model = AssembledModel(backbone=backbone, head=self._bihome_config())
        variables = model.init(jax.random.PRNGKey(0), batch)
        assert 'auxiliary_resnet' in variables['params']
        out = model.apply(variables, batch)
        assert np.isfinite(float(out['loss']))
        for key in ('loss_comp/ln1', 'loss_comp/ln2', 'loss_comp/ln3',
                    'h/h1', 'h/h2'):
            assert key in out['metrics']
        # Loss at perfect prediction: when delta_hat == delta_gt and the two
        # directions are inverse, ln3 term -> small; full zero not expected
        # (features differ at borders), but loss must be finite and the
        # biHomE loss must penalize worse predictions more:
        loss_good = float(out['loss'])

        # gradients flow to backbone but loss is differentiable wrt aux too;
        # freezing is enforced by the optimizer mask (tested in trainer).
        def loss_fn(params):
            return model.apply({**variables, 'params': params}, batch)['loss']

        g = jax.grad(loss_fn)(variables['params'])
        g_backbone = jax.tree_util.tree_leaves(g['backbone'])
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in g_backbone)
        assert np.isfinite(loss_good)

    def test_bihome_dsac_mode(self):
        batch = make_batch(target_gen='all_points')
        backbone = backbones.RethinkingBackbone(
            variant='doubleline', target_keys=('pf_hat_12', 'pf_hat_21'))
        head = self._bihome_config(delta_hat_keys=(),
                                   pf_keys=('pf_hat_12', 'pf_hat_21'),
                                   hypothesis_no=1,
                                   points_per_hypothesis=64)
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(
            {'params': jax.random.PRNGKey(0), 'dsac': jax.random.PRNGKey(1)},
            batch)
        out = model.apply(variables, batch,
                          rngs={'dsac': jax.random.PRNGKey(2)})
        assert np.isfinite(float(out['loss']))
        assert out['delta_hat'].shape == (2, 4, 2)
        delta_hat, _ = model.apply(variables, batch, method='predict',
                                   rngs={'dsac': jax.random.PRNGKey(3)})
        assert delta_hat.shape == (2, 4, 2)

    def test_multihead_mse_mode(self):
        batch = make_batch()
        backbone = backbones.ResNet34Backbone(variant='oneline')
        head = self._bihome_config(triplet_loss='',
                                   delta_hat_keys=('delta_hat_12',))
        model = AssembledModel(backbone=backbone, head=head)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch)
        assert out['ground_truth'].shape == out['network_output'].shape
        loss = losses.compute_loss('MSELoss', out)
        assert np.isfinite(float(loss))
        loss_cos = losses.compute_loss('CosineDistance', out)
        assert np.isfinite(float(loss_cos))

    def test_bihome_prefers_true_delta(self):
        # Core sanity of the biHomE objective: with a frozen random
        # extractor, the loss at the true delta must be lower than at a
        # far-off delta (feature alignment vs misalignment).
        batch = make_batch(seed=4)
        backbone = backbones.ResNet34Backbone(
            variant='doubleline',
            target_keys=('delta_hat_12', 'delta_hat_21'))
        model = AssembledModel(backbone=backbone, head=self._bihome_config())
        variables = model.init(jax.random.PRNGKey(0), batch)

        corners_local = geometry.image_corners(PS, PS, batch_size=2)
        h_true = geometry.four_point_to_homography(corners_local,
                                                   batch['delta'])
        delta_21_true = (geometry.transform_points(
            jnp.linalg.inv(h_true), corners_local) - corners_local)

        def loss_with(delta12, delta21):
            # monkeypatch backbone outputs by injecting into the batch is not
            # possible; instead apply only the head math via the public
            # module: create a fixed-output backbone.
            class Fixed(backbones.ResNet34Backbone):
                def __call__(self, data, train=False):
                    return {'delta_hat_12': delta12,
                            'delta_hat_21': delta21}
            m = AssembledModel(backbone=Fixed(), head=self._bihome_config())
            v = m.init(jax.random.PRNGKey(0), batch)
            v = {**v, 'params': {**v['params'],
                                 'auxiliary_resnet':
                                     variables['params']['auxiliary_resnet']}}
            return float(m.apply(v, batch)['loss'])

        good = loss_with(batch['delta'], delta_21_true)
        bad = loss_with(batch['delta'] + 10.0, delta_21_true - 10.0)
        assert good < bad, (good, bad)


def test_dsac_reference_weighted_sampling_distribution():
    # Exact inverse-CDF sampling of P(i) ∝ i must match the analytic CDF.
    from bihome_tpu.heads import dsac as dsac_lib
    import jax
    n = 256
    pts = jnp.zeros((1, n, 2))
    # sample many indices via the internal path
    key = jax.random.PRNGKey(0)
    total = float((n - 1) * n)
    u = jax.random.uniform(key, (1, 200000), dtype=jnp.float32)
    k = jnp.ceil((jnp.sqrt(1.0 + 4.0 * u * total) - 1.0) / 2.0)
    idx = np.asarray(jnp.clip(k.astype(jnp.int32), 1, n - 1)).ravel()
    assert idx.min() >= 1 and idx.max() <= n - 1
    # Empirical CDF vs analytic F(k) = k(k+1)/((n-1)n)
    for q in (64, 128, 192):
        emp = (idx <= q).mean()
        ana = q * (q + 1) / ((n - 1) * n)
        assert abs(emp - ana) < 0.01, (q, emp, ana)


def test_dsac_sample_from_pf_matches_full_mapping():
    # The gather-first fast path must reproduce sample_hypotheses on
    # (coords, coords + pf) exactly: same PRNG consumption, same indices,
    # same reconstructed coordinates, same homographies.
    from bihome_tpu.heads import dsac as dsac_lib
    import jax
    b, h, w = 3, 8, 11
    key = jax.random.PRNGKey(7)
    pf = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 2)) * 3.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    coords = jnp.broadcast_to(coords[None], (b, h * w, 2))
    mapping = coords + pf.reshape(b, -1, 2)
    for sampling in ('reference-weighted', 'uniform'):
        full = dsac_lib.sample_hypotheses(coords, mapping, key, 5, 4, sampling)
        fast = dsac_lib.sample_hypotheses_from_pf(pf, key, 5, 4, sampling)
        np.testing.assert_allclose(np.asarray(full), np.asarray(fast),
                                   rtol=1e-5, atol=1e-5)


def test_refine_delta_on_pf_beats_sampled_hypothesis():
    """DSAC_PREDICT_REFINE spec: on a noisy perspective field the
    all-points weighted refit must recover the true delta better than the
    64-point sampled-subset DLT it starts from, and outliers past the
    inlier threshold must not drag it (robust weights)."""
    from bihome_tpu.heads import dsac as dsac_lib
    rng = np.random.RandomState(0)
    b, h, w = 3, 32, 32
    delta_gt = jnp.asarray(rng.uniform(-8, 8, (b, 4, 2)).astype(np.float32))
    fp = jnp.broadcast_to(
        jnp.array([[0, 0], [w, 0], [w, h], [0, h]], jnp.float32)[None],
        (b, 4, 2))
    h_gt = geometry.four_point_to_homography(fp, delta_gt)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    coords = jnp.asarray(
        np.broadcast_to(np.stack([xs.ravel(), ys.ravel()], -1)[None],
                        (b, h * w, 2)).copy())
    mapping = geometry.transform_points(h_gt, coords)
    pf_clean = (mapping - coords).reshape(b, h, w, 2)
    noise = rng.normal(0, 0.5, pf_clean.shape).astype(np.float32)
    # 5% gross outliers (e.g. occluded / textureless regions).
    out_mask = (rng.rand(b, h, w, 1) < 0.05).astype(np.float32)
    outliers = rng.uniform(-20, 20, pf_clean.shape).astype(np.float32)
    pf = pf_clean + noise + out_mask * outliers

    # Initial estimate: DLT on a random 64-point subset (what
    # hypothesis_no=1 DSAC prediction does).
    idx = rng.choice(h * w, 64, replace=False)
    p1 = coords[:, idx]
    p2 = p1 + jnp.asarray(pf.reshape(b, -1, 2)[:, idx])
    h_hyp = geometry.find_homography_dlt(p1, p2)
    delta_hyp = geometry.transform_points(h_hyp, fp) - fp

    refined = dsac_lib.refine_delta_on_pf(jnp.asarray(pf), delta_hyp, 3.0)

    def mace(d):
        return float(jnp.mean(jnp.linalg.norm(d - delta_gt, axis=-1)))

    assert mace(refined) < 0.7 * mace(delta_hyp)
    assert mace(refined) < 0.3

    # Extra IRLS rounds re-weight by the refined fit's residuals: they
    # must not regress, and typically tighten the outlier rejection.
    refined3 = dsac_lib.refine_delta_on_pf(jnp.asarray(pf), delta_hyp, 3.0,
                                           iters=3)
    assert mace(refined3) <= mace(refined) * 1.05


def test_dsac_predict_bidirectional_fuses_both_fields():
    """DSAC_PREDICT_BIDIRECTIONAL spec: the DoubleLine 2->1 field is an
    independent estimate of the same homography (H12 = H21^-1); fusing it
    must (a) recover the exact delta when both fields are exact and
    (b) beat the 1->2-only fit when only the 2->1 field is clean."""
    from flax import linen as nn

    class FieldBackbone(nn.Module):
        @nn.compact
        def __call__(self, data, train=False):
            return {'pf_hat_12': data['pf12'], 'pf_hat_21': data['pf21']}

    rng = np.random.RandomState(1)
    b, h, w = 2, 32, 32
    delta_gt = jnp.asarray(rng.uniform(-6, 6, (b, 4, 2)).astype(np.float32))
    fp = jnp.broadcast_to(
        jnp.array([[0, 0], [w, 0], [w, h], [0, h]], jnp.float32)[None],
        (b, 4, 2))
    h12 = geometry.four_point_to_homography(fp, delta_gt)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    coords = jnp.asarray(
        np.broadcast_to(np.stack([xs.ravel(), ys.ravel()], -1)[None],
                        (b, h * w, 2)).copy())
    pf12 = (geometry.transform_points(h12, coords) - coords
            ).reshape(b, h, w, 2)
    pf21 = (geometry.transform_points(geometry.inv3x3(h12), coords) - coords
            ).reshape(b, h, w, 2)

    def build(bidir):
        cfg = HeadConfig.from_yaml({
            'NAME': 'PerceptualHead', 'PF_KEYS': ['pf_hat_12', 'pf_hat_21'],
            'PATCH_KEYS': ['patch_1', 'patch_2'], 'TARGET_GEN': 'all_points',
            'RANSAC_HYPOTHESIS_NO': 1, 'POINTS_PER_HYPOTHESIS': 64,
            'DSAC_PREDICT_REFINE': True,
            'DSAC_PREDICT_BIDIRECTIONAL': bidir})
        return AssembledModel(backbone=FieldBackbone(), head=cfg)

    def mace(d):
        return float(jnp.mean(jnp.linalg.norm(d - delta_gt, axis=-1)))

    def predict(model, batch):
        variables = model.init(
            {'params': jax.random.PRNGKey(0), 'dsac': jax.random.PRNGKey(1)},
            batch, method='predict')
        d, _ = model.apply(variables, batch, method='predict',
                           rngs={'dsac': jax.random.PRNGKey(2)})
        return d

    clean = {'pf12': pf12, 'pf21': pf21}
    assert mace(predict(build(True), clean)) < 0.05

    noisy12 = {'pf12': pf12 + jnp.asarray(
        rng.normal(0, 1.0, pf12.shape).astype(np.float32)), 'pf21': pf21}
    err_uni = mace(predict(build(False), noisy12))
    err_bi = mace(predict(build(True), noisy12))
    assert err_bi < 0.7 * err_uni


def test_dsac_predict_refine_config_knob():
    cfg = HeadConfig.from_yaml({'NAME': 'PerceptualHead',
                                'DSAC_PREDICT_REFINE': True,
                                'DSAC_PREDICT_REFINE_ITERS': 3,
                                'DSAC_PREDICT_REFINE_THRESHOLD': 5.0})
    assert cfg.dsac_predict_refine
    assert cfg.dsac_predict_refine_iters == 3
    assert cfg.dsac_predict_refine_threshold == 5.0
    default = HeadConfig.from_yaml({'NAME': 'PerceptualHead'})
    assert not default.dsac_predict_refine
    assert default.dsac_predict_refine_iters == 1
    # <=0 means "reuse SCORING_DISTANCE_THRESHOLD"
    assert default.dsac_predict_refine_threshold <= 0


# --------------------------------------------------------------------- #
# Multi-hypothesis DSAC (VERDICT r3 item 4): hypothesis_no > 1 with every
# scoring method, value-checked vs numpy and executed THROUGH the loss.
# --------------------------------------------------------------------- #


def _np_transform_points(h, pts):
    ones = np.ones((*pts.shape[:-1], 1))
    p = np.concatenate([pts, ones], axis=-1) @ h.transpose(0, 2, 1)
    return p[..., :2] / p[..., 2:3]


@pytest.mark.parametrize('method', ['repr_error', 'inliers_ratio',
                                    'soft_inliers_ratio'])
def test_dsac_score_hypotheses_matches_numpy_oracle(method):
    """score_hypotheses value parity vs an independent numpy computation
    of the reference scoring definitions (ref: ransac_utils.py:77-128,
    incl. the softmax(-scores) sign quirk that DOWN-weights high
    inliers_ratio hypotheses)."""
    from bihome_tpu.heads import dsac as dsac_lib
    rs = np.random.RandomState(3)
    b, n, npts = 2, 4, 64
    coords = rs.uniform(0, 16, (b, npts, 2)).astype(np.float32)
    mapping = coords + rs.uniform(-2, 2, (b, npts, 2)).astype(np.float32)
    hyps = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    hyps += rs.uniform(-0.02, 0.02, hyps.shape).astype(np.float32)
    hyps[..., 2, 2] = 1.0

    thr, beta = 2.0, 1.5
    scores, _ = dsac_lib.score_hypotheses(
        jnp.asarray(coords), jnp.asarray(mapping), jnp.asarray(hyps),
        method, thr, beta)
    scores = np.asarray(scores)

    raw = np.zeros((b, n), np.float32)
    for i in range(b):
        t = _np_transform_points(hyps[i], np.tile(coords[i], (n, 1, 1)))
        d = t - mapping[i][None]
        if method == 'repr_error':
            raw[i] = np.abs(d).sum(-1).sum(-1)
        elif method == 'inliers_ratio':
            raw[i] = (np.linalg.norm(d, axis=-1) < thr).mean(-1)
        else:
            raw[i] = (1 / (1 + np.exp(-beta * (np.linalg.norm(d, axis=-1)
                                               - thr)))).sum(-1)
    e = np.exp(-raw - np.max(-raw, axis=-1, keepdims=True))
    want = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(scores.sum(-1), 1.0, rtol=1e-5)


@pytest.mark.slow
class TestMultiHypothesisThroughLoss:
    """hypothesis_no>1 executed through the FULL biHomE loss for every
    scoring method (ref: PerceptualHead.py:154-205 + ransac_utils.py:
    76-128) — previously only the graft surface was tested."""

    def _model(self, method, n_hyp=3):
        class PFFromData(backbones.RethinkingBackbone):
            def __call__(self, data, train=False):
                return {'pf_hat_12': data['pf_in_12'],
                        'pf_hat_21': data['pf_in_21']}

        head = HeadConfig(
            name='PerceptualHead', patch_size=PS,
            patch_keys=('patch_1', 'patch_2'), delta_hat_keys=(),
            pf_keys=('pf_hat_12', 'pf_hat_21'),
            hypothesis_no=n_hyp, points_per_hypothesis=16,
            scoring_method=method, scoring_distance_threshold=3.0,
            scoring_distance_beta=1.0,
            auxiliary_resnet='resnet34', auxiliary_resnet_output_layer=1,
            triplet_loss='double-line',
            triplet_aggregation='channel-aware', triplet_margin='inf',
            triplet_distance='l1', triplet_mu=0.01,
            dsac_point_sampling='uniform')
        return AssembledModel(backbone=PFFromData(), head=head)

    def _batch(self):
        batch = dict(make_batch(seed=6, target_gen='all_points'))
        rs = np.random.RandomState(8)
        # gt dense PF + noise for the two directions
        batch['pf_in_12'] = batch['target'] + jnp.asarray(
            rs.uniform(-0.5, 0.5, batch['target'].shape).astype(np.float32))
        batch['pf_in_21'] = -batch['target'] + jnp.asarray(
            rs.uniform(-0.5, 0.5, batch['target'].shape).astype(np.float32))
        return batch

    @pytest.mark.parametrize('method', ['repr_error', 'inliers_ratio',
                                        'soft_inliers_ratio', 'score_cnn'])
    def test_loss_finite_and_shapes(self, method):
        model = self._model(method)
        batch = self._batch()
        rngs = {'params': jax.random.PRNGKey(0),
                'dsac': jax.random.PRNGKey(1)}
        variables = model.init(rngs, batch)
        if method == 'score_cnn':
            assert 'score_cnn' in variables['params']
        out = model.apply(variables, batch,
                          rngs={'dsac': jax.random.PRNGKey(2)})
        assert np.isfinite(float(out['loss'])), method
        # score-weighted delta mixes the n hypotheses -> [B,4,2]
        assert out['delta_hat'].shape == (2, 4, 2)

    def test_gradient_flows_into_pf_through_scoring(self):
        # With n>1 the softmax(-score) weights carry gradient into the PF
        # through BOTH the sampled points and the scoring (repr_error).
        model = self._model('repr_error')
        batch = self._batch()
        rngs = {'params': jax.random.PRNGKey(0),
                'dsac': jax.random.PRNGKey(1)}
        variables = model.init(rngs, batch)

        def loss_of_pf(pf12):
            b = {**batch, 'pf_in_12': pf12}
            return model.apply(variables, b,
                               rngs={'dsac': jax.random.PRNGKey(2)})['loss']

        g = jax.grad(loss_of_pf)(batch['pf_in_12'])
        assert float(jnp.max(jnp.abs(g))) > 0.0
        assert np.all(np.isfinite(np.asarray(g)))

    def test_predict_argmax_hypothesis_recovers_clean_field(self):
        # Clean gt field -> every hypothesis fits the same homography; the
        # argmax-score prediction must recover the true delta closely.
        model = self._model('repr_error', n_hyp=8)
        batch = self._batch()
        batch['pf_in_12'] = batch['target']
        batch['pf_in_21'] = batch['target']        # unused by predict
        rngs = {'params': jax.random.PRNGKey(0),
                'dsac': jax.random.PRNGKey(1)}
        variables = model.init(rngs, batch)
        delta_hat, _ = model.apply(variables, batch, method='predict',
                                   rngs={'dsac': jax.random.PRNGKey(3)})
        err = np.abs(np.asarray(delta_hat) - np.asarray(batch['delta']))
        assert err.max() < 0.5, err.max()
