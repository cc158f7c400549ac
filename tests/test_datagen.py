"""Datagen spec tests: jit pipeline vs numpy reference chain (SURVEY §4b)."""

import numpy as np
import jax
import jax.numpy as jnp

from bihome_tpu.data import numpy_ref, pipeline, synthetic
from bihome_tpu.ops import color

# Small shapes keep single-core CPU compiles tolerable.
H, W, PS, RHO = 60, 80, 32, 8


def small_spec(**kw):
    base = dict(rho=RHO, patch_size=PS, photometric_keys=(),
                max_delta=0.0, target_gen='4_points',
                grayscale_keys=('patch_1', 'patch_2'),
                standardize_keys=('patch_1', 'patch_2'))
    base.update(kw)
    return pipeline.PairSpec(**base)


def make_images(batch=2, seed=3):
    return synthetic.make_image_pool(batch, H, W, seed=seed).astype(
        np.float32)


def inject_corners_delta(batch, seed=7):
    rs = np.random.RandomState(seed)
    corners, deltas = [], []
    for _ in range(batch):
        px = rs.randint(RHO + PS // 2, W - RHO - PS // 2 + 1)
        py = rs.randint(RHO + PS // 2, H - RHO - PS // 2 + 1)
        half = PS // 2
        corners.append([(px - half, py - half), (px + half, py - half),
                        (px + half, py + half), (px - half, py + half)])
        deltas.append(rs.randint(-RHO, RHO, (4, 2)))
    return (np.array(corners, np.float32), np.array(deltas, np.float32))


class TestDeterministicParityWithNumpyRef:
    def test_patches_and_target_match(self):
        imgs = make_images()
        corners, delta = inject_corners_delta(2)
        spec = small_spec()
        got = pipeline.generate_pairs_deterministic(
            jnp.array(imgs), jnp.array(corners), jnp.array(delta), spec)
        for i in range(2):
            ref = numpy_ref.homography_net_prep(
                imgs[i], rho=RHO, patch_size=PS, photometric_keys=(),
                max_delta=0.0, corners=corners[i].astype(np.int64),
                delta=delta[i].astype(np.int64))
            p1_ref = numpy_ref.standardize(numpy_ref.to_grayscale(
                ref['patch_1']))
            p2_ref = numpy_ref.standardize(numpy_ref.to_grayscale(
                ref['patch_2']))
            np.testing.assert_allclose(np.asarray(got['patch_1'][i]),
                                       p1_ref, atol=1e-3)
            np.testing.assert_allclose(np.asarray(got['patch_2'][i]),
                                       p2_ref, atol=2e-2)
            np.testing.assert_allclose(np.asarray(got['homography'][i]),
                                       ref['homography'], rtol=1e-3,
                                       atol=1e-4)

    def test_all_points_target_matches(self):
        imgs = make_images()
        corners, delta = inject_corners_delta(2, seed=11)
        spec = small_spec(target_gen='all_points')
        got = pipeline.generate_pairs_deterministic(
            jnp.array(imgs), jnp.array(corners), jnp.array(delta), spec)
        assert got['target'].shape == (2, PS, PS, 2)
        for i in range(2):
            ref = numpy_ref.homography_net_prep(
                imgs[i], rho=RHO, patch_size=PS, photometric_keys=(),
                max_delta=0.0, target_gen='all_points',
                corners=corners[i].astype(np.int64),
                delta=delta[i].astype(np.int64))
            np.testing.assert_allclose(np.asarray(got['target'][i]),
                                       ref['target'], atol=5e-3)

    def test_pf_corner_values_equal_delta(self):
        # The perspective field at the 4 patch corners equals delta by
        # construction (spec of the all_points target, ref NoOpHead.py:31-49).
        imgs = make_images()
        corners, delta = inject_corners_delta(2, seed=13)
        spec = small_spec(target_gen='all_points')
        got = pipeline.generate_pairs_deterministic(
            jnp.array(imgs), jnp.array(corners), jnp.array(delta), spec)
        pf = np.asarray(got['target'])
        np.testing.assert_allclose(pf[:, 0, 0, :], delta[:, 0], atol=1e-2)
        # top-right corner of patch grid is (x0+ps-1, y0) — one pixel inside
        # the true corner, so compare loosely via the reference oracle above
        # (exact corner parity is covered in test_all_points_target_matches).


class TestRandomizedPipeline:
    def test_shapes_dtypes_and_ranges(self):
        imgs = make_images(4)
        spec = small_spec(photometric_keys=('image_1', 'image_2'),
                          max_delta=32.0, emit_images=('image_1', 'image_2'))
        batch = pipeline.generate_pairs(jnp.array(imgs),
                                        jax.random.PRNGKey(0), spec)
        assert batch['patch_1'].shape == (4, PS, PS, 1)
        assert batch['patch_2'].shape == (4, PS, PS, 1)
        assert batch['delta'].shape == (4, 4, 2)
        assert batch['corners'].shape == (4, 4, 2)
        assert batch['image_1'].shape == (4, H, W, 3)
        assert batch['image_2'].shape == (4, H, W, 3)
        d = np.asarray(batch['delta'])
        assert d.min() >= -RHO and d.max() < RHO
        c = np.asarray(batch['corners'])
        assert c[:, 0, 0].min() >= RHO and c[:, 1, 0].max() <= W - RHO
        assert np.all(np.isfinite(np.asarray(batch['patch_2'])))

    def test_jit_and_seeds(self):
        imgs = jnp.array(make_images(2))
        spec = small_spec()
        fn = jax.jit(pipeline.generate_pairs, static_argnums=2)
        b1 = fn(imgs, jax.random.PRNGKey(5), spec)
        b2 = fn(imgs, jax.random.PRNGKey(5), spec)
        b3 = fn(imgs, jax.random.PRNGKey(6), spec)
        np.testing.assert_array_equal(np.asarray(b1['delta']),
                                      np.asarray(b2['delta']))
        assert not np.array_equal(np.asarray(b1['delta']),
                                  np.asarray(b3['delta']))

    def test_round_trip_warp_convention(self):
        # The de-facto spec from the reference demo (ref:
        # src/data/coco/dataset.py:233-260): warping patch_1 by the
        # patch-local homography (crop=True) reproduces patch_2 where the
        # warped patch stays inside patch_1's support.
        from bihome_tpu import geometry
        imgs = jnp.array(make_images(1, seed=9))
        spec = small_spec(grayscale_keys=(), standardize_keys=())
        batch = pipeline.generate_pairs(imgs, jax.random.PRNGKey(1), spec)
        corners_local = geometry.image_corners(PS, PS, batch_size=1)
        h_local = geometry.four_point_to_homography(
            corners_local, batch['delta'])
        p1_warped = geometry.warp_image(batch['patch_1'], h_local)
        got = np.asarray(p1_warped[0])
        want = np.asarray(batch['patch_2'][0])
        inner = slice(PS // 4, 3 * PS // 4)
        mask = got[inner, inner] > 0
        err = np.abs(got[inner, inner] - want[inner, inner])[mask]
        assert np.median(err) < 8.0, f'median interior error {np.median(err)}'


class TestPhotometric:
    def test_hsv_round_trip(self):
        rs = np.random.RandomState(0)
        rgb = jnp.array(rs.uniform(0, 255, (16, 16, 3)), jnp.float32)
        back = color.hsv_to_rgb(color.rgb_to_hsv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                                   rtol=1e-4, atol=1e-2)

    def test_hsv_matches_numpy_ref_stats(self):
        # Same distortion chain with forced identical params is impossible
        # across PRNGs; instead check output distributions are sane and the
        # op changes the image when max_delta>0 but not when 0.
        imgs = make_images(1)[0]
        from bihome_tpu.data import photometric
        out0 = photometric.photometric_distort_simple(
            jnp.array(imgs), jax.random.PRNGKey(0), 0.0)
        np.testing.assert_array_equal(np.asarray(out0), imgs)
        outs = []
        for s in range(6):
            o = photometric.photometric_distort_simple(
                jnp.array(imgs), jax.random.PRNGKey(s), 32.0)
            outs.append(np.asarray(o))
        assert any(np.abs(o - imgs).max() > 1.0 for o in outs)
        for o in outs:
            assert np.all(np.isfinite(o))

    def test_spec_from_transforms_yaml(self):
        transforms = [
            {'HomographyNetPrep': [32, 128, ['image_1', 'image_2'], 32,
                                   '4_points']},
            {'DictToGrayscale': [['patch_1', 'patch_2']]},
            {'DictStandardize': [[0.443], [0.129], ['patch_1', 'patch_2']]},
            {'DictToTensor': [['patch_1', 'patch_2']]},
        ]
        spec = pipeline.PairSpec.from_transforms(transforms)
        assert spec.rho == 32 and spec.patch_size == 128
        assert spec.max_delta == 32.0
        assert spec.photometric_keys == ('image_1', 'image_2')
        assert spec.standardize_mean == 0.443
        assert spec.grayscale_keys == ('patch_1', 'patch_2')


def test_windowed_fast_path_matches_full_image_path():
    # generate_pairs uses a window-first fast path when no full images are
    # emitted; it must produce identical patches/targets to the full-image
    # path (same key => same pos/delta draws; photometric off).
    imgs = jnp.array(make_images(3, seed=21))
    key = jax.random.PRNGKey(9)
    spec_fast = small_spec(target_gen='all_points')
    spec_full = small_spec(target_gen='all_points',
                           emit_images=('image_2',))
    fast = pipeline.generate_pairs(imgs, key, spec_fast)
    full = pipeline.generate_pairs(imgs, key, spec_full)
    for k in ('patch_1', 'patch_2', 'delta', 'corners', 'target'):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(full[k]),
                                   atol=2e-3, err_msg=k)
    np.testing.assert_allclose(np.asarray(fast['homography']),
                               np.asarray(full['homography']),
                               rtol=1e-4, atol=1e-4)
