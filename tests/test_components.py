"""Tests for auxiliary components: datasets, blobs, dist utils, vis, zoo."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestCifar10:
    def test_reads_batches_py_format(self, tmp_path):
        from bihome_tpu.data.cifar10 import Cifar10Dataset
        root = tmp_path / 'cifar-10-batches-py'
        root.mkdir()
        rs = np.random.RandomState(0)
        for name in [f'data_batch_{i}' for i in range(1, 6)] + ['test_batch']:
            data = {'data': rs.randint(0, 255, (20, 3072), dtype=np.uint8),
                    'labels': list(range(20))}
            with open(root / name, 'wb') as f:
                pickle.dump(data, f)
        train = Cifar10Dataset(str(tmp_path), train=True)
        test = Cifar10Dataset(str(tmp_path), train=False)
        assert len(train) == 100 and len(test) == 20
        img = train.load_image(0)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    def test_patch_equals_width_centers(self):
        # CIFAR-style: patch_size == image width -> centered patch
        # (ref: transforms.py:507-509).
        from bihome_tpu.data import pipeline
        spec = pipeline.PairSpec(rho=4, patch_size=32, photometric_keys=(),
                                 max_delta=0.0, grayscale_keys=(),
                                 standardize_keys=())
        imgs = jnp.ones((2, 32, 32, 3))
        batch = pipeline.generate_pairs(imgs, jax.random.PRNGKey(0), spec)
        c = np.asarray(batch['corners'])
        np.testing.assert_array_equal(c[:, 0], [[0, 0], [0, 0]])


class TestClevrChange:
    def test_pair_sampler_index_mapping(self, tmp_path):
        from PIL import Image
        from bihome_tpu.data.clevr_change import (ClevrChangeDataset,
                                                  ClevrChangePairSampler)
        for sub in ('images', 'nsc_images', 'sc_images'):
            d = tmp_path / sub
            d.mkdir()
            for i in range(3):
                Image.fromarray(np.full((40, 50, 3), i * 20,
                                        np.uint8)).save(d / f'{i}.png')
        ds = ClevrChangeDataset(str(tmp_path), image_size=(50, 40))
        assert len(ds) == 3
        sampler = ClevrChangePairSampler(ds, batch_size=2,
                                         samples_per_epoch=8, mode='nsc',
                                         random_seed=1)
        pairs = sampler.epoch_pairs()
        assert pairs.shape == (8, 2)
        np.testing.assert_array_equal(pairs[:, 1], pairs[:, 0] + 3)
        sampler_sc = ClevrChangePairSampler(ds, 2, 8, mode='sc',
                                            random_seed=1)
        pairs_sc = sampler_sc.epoch_pairs()
        np.testing.assert_array_equal(pairs_sc[:, 1], pairs_sc[:, 0] + 6)
        img = ds.load_image(4)  # nsc index space
        assert img.shape == (40, 50, 3)


class TestBlobs:
    def test_blob_mask_porosity(self):
        from bihome_tpu.data import blobs
        mask = np.asarray(blobs.generate_blobs(jax.random.PRNGKey(0),
                                               (64, 64), porosity=0.5))
        assert mask.dtype == bool
        frac = mask.mean()
        assert 0.4 < frac < 0.6, frac
        # Blobby, not salt-and-pepper: neighbors agree most of the time.
        agree = (mask[1:] == mask[:-1]).mean()
        assert agree > 0.8, agree

    def test_augmentation_composites_from_other_sample(self):
        from bihome_tpu.data import blobs
        batch = {'patch_1': jnp.zeros((3, 32, 32, 1)) + jnp.arange(
            3).reshape(3, 1, 1, 1) * 10.0,
            'patch_2': jnp.full((3, 32, 32, 1), -1.0)}
        out = blobs.apply_blob_augmentation(batch, jax.random.PRNGKey(0),
                                            porosity=0.5)
        p2 = np.asarray(out['patch_2'])
        # Inside blobs: values from a DIFFERENT sample's patch_1.
        vals = set(np.unique(p2).tolist())
        assert -1.0 in vals
        assert any(v in vals for v in (0.0, 10.0, 20.0))
        own = [10.0 * i in set(np.unique(p2[i]).tolist()) for i in range(3)]
        assert not any(own), 'blob content must come from another sample'

    def test_pipeline_integration(self):
        from bihome_tpu.data import pipeline, synthetic
        spec = pipeline.PairSpec(rho=4, patch_size=16, photometric_keys=(),
                                 max_delta=0.0, blob_porosity=0.4,
                                 grayscale_keys=('patch_1', 'patch_2'),
                                 standardize_keys=('patch_1', 'patch_2'))
        imgs = jnp.asarray(synthetic.make_image_pool(2, 40, 48, seed=0),
                           jnp.float32)
        batch = pipeline.generate_pairs(imgs, jax.random.PRNGKey(0), spec)
        assert np.all(np.isfinite(np.asarray(batch['patch_2'])))


class TestDistUtils:
    def test_single_host_degenerate(self):
        from bihome_tpu.parallel import dist_util
        assert dist_util.get_world_size() == 1
        assert dist_util.get_rank() == 0
        assert dist_util.is_main_process()
        dist_util.synchronize()
        assert dist_util.all_gather({'a': np.ones(3)})[0]['a'].shape == (3,)


class TestModelZoo:
    def test_path_passthrough_and_missing_url(self, tmp_path):
        from bihome_tpu.utils import model_zoo
        f = tmp_path / 'w.pth'
        f.write_bytes(b'x')
        assert model_zoo.resolve_weights(str(f)) == str(f)
        with pytest.raises(FileNotFoundError):
            model_zoo.resolve_weights('https://example.com/resnet34.pth',
                                      model_dir=str(tmp_path))
        cached = tmp_path / 'resnet34.pth'
        cached.write_bytes(b'y')
        assert model_zoo.resolve_weights('https://example.com/resnet34.pth',
                                         model_dir=str(tmp_path)) == str(
            cached)


class TestVisualization:
    def test_draw_rect_and_gif(self, tmp_path):
        from bihome_tpu.utils import visualization as vis
        img = np.zeros((40, 40, 3), np.uint8)
        out = vis.draw_rect(img, np.array([[5, 5], [30, 5], [30, 30],
                                           [5, 30]]), 'r')
        assert out[5, 17, 0] == 255 and out[5, 17, 1] == 0
        assert img.sum() == 0  # original untouched
        path = str(tmp_path / 'a.gif')
        vis.save_gif(path, [out, img])
        assert os.path.getsize(path) > 0


class TestOfflinePreprocess:
    def test_rescale_center_crop_npy(self, tmp_path):
        from PIL import Image
        from bihome_tpu.data.datasets import ImageFolderDataset
        src = tmp_path / 'src'
        src.mkdir()
        rs = np.random.RandomState(0)
        for i in range(2):
            Image.fromarray(rs.randint(0, 255, (123, 456, 3),
                                       np.uint8)).save(src / f'{i}.jpg')
        ds = ImageFolderDataset(str(src), image_size=(64, 48))
        out = tmp_path / 'out'
        ds.preprocess_offline(str(out))
        arr = np.load(out / '0.npy')
        assert arr.shape == (48, 64, 3) and arr.dtype == np.uint8
        # Round-trip: .npy folder loads directly.
        ds2 = ImageFolderDataset(str(out), image_size=(64, 48))
        assert len(ds2) == 2
        np.testing.assert_array_equal(ds2.load_image(0), arr)


class TestSyntheticPool:
    """The pool must have natural-image channel statistics: PDS distortion
    (hue/saturation/channel permutation) barely perturbs the grayscale
    projection of natural images, and the PDS-COCO protocol depends on that
    (see synthetic.py module docstring)."""

    def test_natural_channel_correlation(self):
        from bihome_tpu.data import synthetic
        pool = synthetic.make_image_pool(4, 120, 160, seed=3)
        corrs = []
        for img in pool.astype(np.float32):
            ch = img.reshape(-1, 3).T
            c = np.corrcoef(ch)
            corrs.append((c[0, 1] + c[0, 2] + c[1, 2]) / 3)
        assert np.mean(corrs) > 0.9

    def test_grayscale_survives_pds_distortion(self):
        from bihome_tpu.data import synthetic
        from bihome_tpu.data.numpy_ref import (photometric_distort_simple,
                                               to_grayscale)
        pool = synthetic.make_image_pool(4, 120, 160, seed=3)
        rs = np.random.RandomState(0)
        for img in pool.astype(np.float32):
            g0 = to_grayscale(
                photometric_distort_simple(img.copy(), 32.0, rs)).ravel()
            g1 = to_grayscale(
                photometric_distort_simple(img.copy(), 32.0, rs)).ravel()
            assert np.corrcoef(g0, g1)[0, 1] > 0.98

    def test_legacy_independent_channels(self):
        from bihome_tpu.data import synthetic
        pool = synthetic.make_image_pool(2, 120, 160, seed=3, chroma=None)
        img = pool[0].astype(np.float32)
        c = np.corrcoef(img.reshape(-1, 3).T)
        assert abs(c[0, 1]) < 0.6  # no shared luminance structure
