"""Host-side transform parity: the full reference TRANSFORMS vocabulary
(ref: src/data/transforms.py:11-396) plus its config-path wiring
(PairSpec.from_transforms -> host_prep / photometric_full_keys)."""

import numpy as np

from bihome_tpu.data import transforms_host as th


class TestRandomCrop:

    def test_crop_shapes_and_content(self):
        rs = np.random.RandomState(0)
        img = np.arange(20 * 30 * 3).reshape(20, 30, 3).astype(np.float32)
        crop = th.RandomCrop((8, 10), random_state=rs)
        (out,), tgt = crop(([img], 'tgt'))
        assert out.shape == (8, 10, 3)
        assert tgt == 'tgt'
        # Crop content must be a contiguous window of the source.
        top_left = out[0, 0, 0]
        row = int(top_left) // (30 * 3)
        col = (int(top_left) % (30 * 3)) // 3
        np.testing.assert_array_equal(out, img[row:row + 8, col:col + 10])

    def test_full_size_is_identity(self):
        rs = np.random.RandomState(0)
        img = np.random.rand(8, 10, 3).astype(np.float32)
        (out,), _ = th.RandomCrop((8, 10), random_state=rs)(([img], None))
        np.testing.assert_array_equal(out, img)


class TestPhotometricDistort:

    def test_identity_when_coinflips_lose(self):
        class ZeroRS:
            def randint(self, *a):
                return 0

            def uniform(self, lo, hi):
                raise AssertionError('should not draw')

        img = np.random.RandomState(1).rand(6, 6, 3).astype(np.float32) * 255
        pd = th.PhotometricDistort(['image_1'], random_state=ZeroRS())
        out = pd({'image_1': img})['image_1']
        # Only the HSV round-trip touches values (float-exact within eps).
        np.testing.assert_allclose(out, img, atol=2e-3)

    def test_distorts_and_preserves_shape(self):
        rs = np.random.RandomState(3)
        img = np.random.RandomState(1).rand(6, 6, 3).astype(np.float32) * 255
        pd = th.PhotometricDistort(['image_1', 'image_2'], random_state=rs)
        data = pd({'image_1': img, 'image_2': img.copy()})
        assert data['image_1'].shape == img.shape
        # Independent draws per key -> the two copies diverge.
        assert not np.allclose(data['image_1'], data['image_2'])

    def test_hue_wraps_and_channels_permute(self):
        rs = np.random.RandomState(0)
        imgs = [th.PhotometricDistort(['k'], random_state=rs)(
            {'k': np.full((4, 4, 3), v, np.float32)})['k']
            for v in (0.0, 255.0)]
        for out in imgs:
            assert np.all(np.isfinite(out))


class TestRescale:

    def test_int_matches_smaller_edge(self):
        img = np.random.RandomState(0).randint(
            0, 255, (40, 20, 3)).astype(np.uint8)
        (out,), _ = th.Rescale(30)(([img], None))
        # h > w: new_w = 30, new_h = 30*h/w = 60 (reference code semantics).
        assert out.shape == (60, 30, 3)

    def test_tuple_covers_target_box(self):
        img = np.random.RandomState(0).randint(
            0, 255, (30, 60, 3)).astype(np.uint8)
        (out,), _ = th.Rescale((32, 24))(([img], None))   # (w, h)
        h, w = out.shape[:2]
        assert w >= 32 and h >= 24
        assert w == 32 or h == 24                # one edge matches exactly
        np.testing.assert_allclose(h / w, 30 / 60, atol=0.05)  # aspect kept

    def test_value_parity_on_identity_resize(self):
        img = np.random.RandomState(1).randint(
            0, 255, (16, 16, 3)).astype(np.uint8)
        (out,), _ = th.Rescale((16, 16))(([img], None))
        np.testing.assert_array_equal(out, img)


class TestCenterCrop:

    def test_center_window(self):
        img = np.arange(12 * 10 * 3).reshape(12, 10, 3).astype(np.float32)
        (out,), _ = th.CenterCrop((6, 8))(([img], None))   # (w, h)
        np.testing.assert_array_equal(out, img[2:10, 2:8])


class TestToGrayscaleStandardize:

    def test_luma_weights(self):
        img = np.random.RandomState(0).rand(5, 5, 3).astype(np.float32)
        (out,), _ = th.ToGrayscale()(([img], None))
        want = (img[..., 0] * 0.299 + img[..., 1] * 0.587
                + img[..., 2] * 0.114)[..., None]
        np.testing.assert_allclose(out, want, rtol=1e-6)
        assert out.shape == (5, 5, 1)

    def test_standardize_values_and_list_args(self):
        img = np.full((3, 3, 1), 128, np.uint8)
        (out,), _ = th.Standardize([0.443], [0.129])(([img], None))
        np.testing.assert_allclose(out, (128 / 255 - 0.443) / 0.129,
                                   rtol=1e-6)


class TestHostPrepChain:

    def test_build_and_apply(self):
        chain = th.build_host_prep(
            [('Rescale', ((24, 20),)), ('CenterCrop', ((24, 20),))],
            np.random.RandomState(0))
        img = np.random.RandomState(2).randint(
            0, 255, (40, 30, 3)).astype(np.uint8)
        out = chain(img)
        assert out.shape == (20, 24, 3)

    def test_random_crop_seeded(self):
        img = np.random.RandomState(2).randint(
            0, 255, (40, 30, 3)).astype(np.uint8)
        a = th.build_host_prep([('RandomCrop', ((8, 8),))],
                               np.random.RandomState(7))(img)
        b = th.build_host_prep([('RandomCrop', ((8, 8),))],
                               np.random.RandomState(7))(img)
        np.testing.assert_array_equal(a, b)

    def test_dataset_wrapper(self):
        from bihome_tpu.data import datasets
        base = datasets.SyntheticDataset(num_images=3, image_size=(32, 24))
        ds = datasets.HostPrepDataset(base, (('CenterCrop', ((16, 12),)),),
                                      random_seed=0)
        assert len(ds) == 3
        img = ds.load_image(0)
        assert img.shape == (12, 16, 3)
        np.testing.assert_array_equal(
            img, base.load_image(0)[6:18, 8:24])


class TestConfigPathVocabulary:

    def test_full_vocabulary_builds(self):
        from bihome_tpu.data.pipeline import PairSpec
        transforms = [
            {'Rescale': [[320, 240]]},
            {'CenterCrop': [[320, 240]]},
            {'RandomCrop': [[300, 220]]},
            {'HomographyNetPrep': [32, 128, ['image_1', 'image_2'], 0,
                                   '4_points']},
            {'PhotometricDistort': [['patch_1', 'patch_2']]},
            {'DictToGrayscale': [['patch_1', 'patch_2']]},
            {'DictStandardize': [[0.443], [0.129], ['patch_1', 'patch_2']]},
            {'DictToTensor': [['patch_1', 'patch_2']]},
        ]
        spec = PairSpec.from_transforms(transforms)
        assert spec.host_prep == (('Rescale', ((320, 240),)),
                                  ('CenterCrop', ((320, 240),)),
                                  ('RandomCrop', ((300, 220),)))
        assert spec.photometric_full_keys == ('patch_1', 'patch_2')
        assert spec.rho == 32 and spec.patch_size == 128

    def test_tuple_stage_transforms_build(self):
        from bihome_tpu.data.pipeline import PairSpec
        spec = PairSpec.from_transforms([
            {'Rescale': [64]},
            {'ToGrayscale': []},
            {'Standardize': [[0.5], [0.25]]},
            {'ToTensorWithTarget': []},
        ])
        assert spec.host_prep == (('Rescale', (64,)), ('ToGrayscale', ()),
                                  ('Standardize', ([0.5], [0.25])))

    def test_unknown_transform_still_fails(self):
        import pytest
        from bihome_tpu.data.pipeline import PairSpec
        with pytest.raises(ValueError):
            PairSpec.from_transforms([{'NotATransform': []}])

    def test_datagen_with_full_photometric(self):
        import dataclasses
        import jax
        import jax.numpy as jnp
        from bihome_tpu.data import pipeline, synthetic
        imgs = jnp.asarray(synthetic.make_image_pool(2, 60, 80, seed=0),
                           jnp.float32)
        base = pipeline.PairSpec(
            rho=8, patch_size=32, photometric_keys=(), max_delta=0.0,
            grayscale_keys=('patch_1', 'patch_2'),
            standardize_keys=('patch_1', 'patch_2'))
        spec = dataclasses.replace(
            base, photometric_full_keys=('patch_1', 'patch_2'))
        key = jax.random.PRNGKey(0)
        plain = pipeline.generate_pairs(imgs, key, base)
        distorted = pipeline.generate_pairs(imgs, key, spec)
        # Same geometry (randomness for corners/delta is shared) ...
        np.testing.assert_array_equal(np.asarray(plain['delta']),
                                      np.asarray(distorted['delta']))
        # ... but photometrically distorted, still grayscale+standardized.
        assert distorted['patch_1'].shape == plain['patch_1'].shape
        assert distorted['patch_1'].shape[-1] == 1
        assert np.all(np.isfinite(np.asarray(distorted['patch_1'])))
        assert not np.allclose(np.asarray(distorted['patch_1']),
                               np.asarray(plain['patch_1']))

    def test_device_full_chain_matches_host_distribution(self):
        """photometric_distort_full (jnp) vs PhotometricDistort (host
        numpy): same fixed-parameter chain, so per-pixel output moments
        over many independent draws must agree."""
        import jax
        from bihome_tpu.data import photometric
        img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(
            np.float32)
        n = 400
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        dev = np.asarray(jax.vmap(
            lambda k: photometric.photometric_distort_full(img, k))(keys))
        rs = np.random.RandomState(2)
        host = np.stack([
            th.PhotometricDistort(['x'], random_state=rs)({'x': img})['x']
            for _ in range(n)])
        np.testing.assert_allclose(dev.mean(), host.mean(), rtol=0.05)
        np.testing.assert_allclose(dev.std(), host.std(), rtol=0.10)


class TestToTensorWithTarget:

    def test_chw_stack(self):
        imgs = [np.random.rand(5, 7, 3).astype(np.float32)
                for _ in range(2)]
        out, tgt = th.ToTensorWithTarget()((imgs, [1.0, 2.0]))
        assert out.shape == (2, 3, 5, 7)
        np.testing.assert_array_equal(out[0], imgs[0].transpose(2, 0, 1))
        np.testing.assert_array_equal(tgt, [1.0, 2.0])

    def test_none_target(self):
        imgs = [np.zeros((2, 2, 3), np.float32)]
        out, tgt = th.ToTensorWithTarget()((imgs, None))
        assert tgt is None and out.shape == (1, 3, 2, 2)
