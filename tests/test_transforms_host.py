"""Host-side transform parity: RandomCrop / PhotometricDistort /
ToTensorWithTarget (ref: src/data/transforms.py:49-84,265-293,381-396)."""

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
