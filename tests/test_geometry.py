"""Geometry core spec tests (SURVEY.md §4: geometry round-trips vs oracles)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bihome_tpu import geometry
from tests import oracles


RNG = np.random.RandomState(0)


def random_corners_deltas(batch=4, rho=32, patch=128, img_w=320, img_h=240):
    corners = []
    deltas = []
    for _ in range(batch):
        px = RNG.randint(rho + patch // 2, img_w - rho - patch // 2 + 1)
        py = RNG.randint(rho + patch // 2, img_h - rho - patch // 2 + 1)
        c = np.array([(px - patch // 2, py - patch // 2),
                      (px + patch // 2, py - patch // 2),
                      (px + patch // 2, py + patch // 2),
                      (px - patch // 2, py + patch // 2)], dtype=np.float64)
        corners.append(c)
        deltas.append(RNG.randint(-rho, rho, (4, 2)).astype(np.float64))
    return np.stack(corners), np.stack(deltas)


class TestPerspectiveTransform:
    def test_maps_corners_exactly(self):
        corners, deltas = random_corners_deltas()
        h = geometry.four_point_to_homography(jnp.array(corners),
                                              jnp.array(deltas))
        mapped = geometry.transform_points(h, jnp.array(corners))
        np.testing.assert_allclose(np.asarray(mapped), corners + deltas,
                                   atol=2e-3)

    def test_matches_float64_oracle(self):
        corners, deltas = random_corners_deltas()
        h = np.asarray(geometry.four_point_to_homography(
            jnp.array(corners), jnp.array(deltas)))
        for i in range(len(corners)):
            h_ref = oracles.solve_homography_4pt(corners[i],
                                                 corners[i] + deltas[i])
            np.testing.assert_allclose(h[i], h_ref, rtol=1e-4, atol=1e-5)

    def test_identity_delta(self):
        corners, _ = random_corners_deltas()
        h = geometry.four_point_to_homography(
            jnp.array(corners), jnp.zeros_like(jnp.array(corners)))
        np.testing.assert_allclose(np.asarray(h),
                                   np.tile(np.eye(3), (len(corners), 1, 1)),
                                   atol=1e-5)

    def test_crop_flag_shifts_to_origin(self):
        corners, deltas = random_corners_deltas(batch=2)
        h_crop = geometry.four_point_to_homography(
            jnp.array(corners), jnp.array(deltas), crop=True)
        shifted = corners - corners[:, 0:1]
        h_manual = geometry.four_point_to_homography(
            jnp.array(shifted), jnp.array(deltas))
        np.testing.assert_allclose(np.asarray(h_crop), np.asarray(h_manual),
                                   atol=1e-6)

    def test_transform_points_oracle(self):
        corners, deltas = random_corners_deltas(batch=2)
        h = np.stack([oracles.solve_homography_4pt(corners[i],
                                                   corners[i] + deltas[i])
                      for i in range(2)])
        pts = RNG.uniform(0, 320, (2, 50, 2))
        got = geometry.transform_points(jnp.array(h, jnp.float32),
                                        jnp.array(pts, jnp.float32))
        want = np.stack([oracles.apply_homography(h[i], pts[i])
                         for i in range(2)])
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-3)


class TestWarp:
    def test_identity_warp(self):
        img = RNG.uniform(0, 255, (1, 12, 17, 3)).astype(np.float32)
        h = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
        out = geometry.warp_image(jnp.array(img), h)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)

    def test_translation_is_shift(self):
        img = RNG.uniform(0, 255, (1, 10, 10, 1)).astype(np.float32)
        # dst(x) = src(H x) with H = translation by (2, 3).
        h = np.eye(3, dtype=np.float32)
        h[0, 2] = 2.0
        h[1, 2] = 3.0
        out = np.asarray(geometry.warp_image(jnp.array(img), jnp.array(h[None])))
        np.testing.assert_allclose(out[0, :7, :8], img[0, 3:, 2:], atol=1e-4)
        assert np.all(out[0, 7:, :] == 0)
        assert np.all(out[0, :, 8:] == 0)

    def test_matches_loop_oracle(self):
        img = RNG.uniform(0, 255, (14, 16, 2)).astype(np.float32)
        src = np.array([[0, 0], [16, 0], [16, 14], [0, 14]], dtype=np.float64)
        dst = src + RNG.uniform(-3, 3, (4, 2))
        h = oracles.solve_homography_4pt(src, dst)
        got = np.asarray(geometry.warp_image(
            jnp.array(img[None]), jnp.array(h[None], dtype=jnp.float32)))[0]
        want = oracles.warp_image_loop(img, h, (14, 16))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)

    def test_matches_torch_grid_sample(self):
        img = RNG.uniform(0, 255, (32, 40, 1)).astype(np.float32)
        src = np.array([[0, 0], [40, 0], [40, 32], [0, 32]], dtype=np.float64)
        dst = src + RNG.uniform(-6, 6, (4, 2))
        h = oracles.solve_homography_4pt(src, dst)
        got = np.asarray(geometry.warp_image(
            jnp.array(img[None]), jnp.array(h[None], dtype=jnp.float32)))[0]
        want = oracles.warp_image_torch(img, h, (32, 40))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)

    def test_warp_perspective_is_inverse_convention(self):
        img = RNG.uniform(0, 255, (1, 20, 20, 1)).astype(np.float32)
        src = np.array([[0, 0], [20, 0], [20, 20], [0, 20]], dtype=np.float64)
        dst = src + RNG.uniform(-2, 2, (4, 2))
        h = oracles.solve_homography_4pt(src, dst).astype(np.float32)
        a = geometry.warp_perspective(jnp.array(img), jnp.array(h[None]))
        b = geometry.warp_image(jnp.array(img),
                                jnp.array(np.linalg.inv(h)[None]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_round_trip_interior(self):
        # Smooth image: round-tripping white noise through two bilinear
        # resamplings is legitimately lossy, so test on a smooth signal.
        yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
        img = (100 + 60 * np.sin(xx / 6.0) + 60 * np.cos(yy / 7.0))
        img = img[None, :, :, None].astype(np.float32)
        src = np.array([[0, 0], [48, 0], [48, 48], [0, 48]], dtype=np.float64)
        dst = src + RNG.uniform(-4, 4, (4, 2))
        h = oracles.solve_homography_4pt(src, dst).astype(np.float32)
        warped = geometry.warp_image(jnp.array(img), jnp.array(h[None]))
        back = geometry.warp_image(warped,
                                   jnp.array(np.linalg.inv(h)[None]))
        # Compare interior (borders lose info to zero padding).
        got = np.asarray(back)[0, 12:36, 12:36]
        want = img[0, 12:36, 12:36]
        np.testing.assert_allclose(got, want, rtol=0.1, atol=3.0)

    def test_gradients_flow_through_delta(self):
        img = jnp.array(RNG.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
        corners = geometry.image_corners(16, 16, batch_size=2)

        def loss(delta):
            h = geometry.four_point_to_homography(corners, delta)
            warped = geometry.warp_image(img, h)
            return jnp.sum(warped ** 2)

        g = jax.grad(loss)(jnp.ones((2, 4, 2), jnp.float32) * 0.5)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 1e-6)


class TestFindHomographyDLT:
    def test_recovers_exact_homography(self):
        src_c = np.array([[0, 0], [128, 0], [128, 128], [0, 128]],
                         dtype=np.float64)
        delta = RNG.randint(-32, 32, (4, 2)).astype(np.float64)
        h_true = oracles.solve_homography_4pt(src_c, src_c + delta)
        pts1 = RNG.uniform(0, 128, (1, 64, 2))
        pts2 = np.stack([oracles.apply_homography(h_true, pts1[0])])
        h_fit = np.asarray(geometry.find_homography_dlt(
            jnp.array(pts1, jnp.float32), jnp.array(pts2, jnp.float32)))[0]
        # Compare action on points rather than raw entries.
        probe = RNG.uniform(0, 128, (40, 2))
        np.testing.assert_allclose(oracles.apply_homography(h_fit, probe),
                                   oracles.apply_homography(h_true, probe),
                                   atol=0.1)

    def test_weighted_ignores_outliers(self):
        src_c = np.array([[0, 0], [64, 0], [64, 64], [0, 64]], np.float64)
        delta = RNG.uniform(-8, 8, (4, 2))
        h_true = oracles.solve_homography_4pt(src_c, src_c + delta)
        pts1 = RNG.uniform(0, 64, (1, 40, 2))
        pts2 = oracles.apply_homography(h_true, pts1[0])[None]
        pts2_noisy = pts2.copy()
        pts2_noisy[0, :10] += 500.0  # gross outliers
        w = np.ones((1, 40), np.float32)
        w[0, :10] = 0.0
        h_fit = np.asarray(geometry.find_homography_dlt(
            jnp.array(pts1, jnp.float32), jnp.array(pts2_noisy, jnp.float32),
            jnp.array(w)))[0]
        probe = RNG.uniform(0, 64, (20, 2))
        np.testing.assert_allclose(oracles.apply_homography(h_fit, probe),
                                   oracles.apply_homography(h_true, probe),
                                   atol=0.2)

    def test_differentiable(self):
        pts1 = jnp.array(RNG.uniform(0, 64, (2, 32, 2)), jnp.float32)
        pts2 = pts1 + 1.0

        def loss(p2):
            h = geometry.find_homography_dlt(pts1, p2)
            return jnp.sum(h ** 2)

        g = jax.grad(loss)(pts2)
        assert np.all(np.isfinite(np.asarray(g)))


def test_mace():
    gt = jnp.zeros((2, 4, 2))
    hat = jnp.ones((2, 4, 2)) * jnp.array([3.0, 4.0])
    assert np.allclose(float(geometry.mace(gt, hat)), 5.0)


def test_image_corners():
    c = np.asarray(geometry.image_corners(10, 20, batch_size=3))
    assert c.shape == (3, 4, 2)
    np.testing.assert_array_equal(c[0], [[0, 0], [20, 0], [20, 10], [0, 10]])


def test_tent_sample_matches_gather():
    # The MXU tent-contraction sampler must be numerically identical to the
    # gather-based bilinear sampler (zero padding included).
    rs = np.random.RandomState(3)
    img = jnp.array(rs.uniform(0, 255, (20, 26, 3)), jnp.float32)
    x = jnp.array(rs.uniform(-3, 28, (500,)), jnp.float32)
    y = jnp.array(rs.uniform(-3, 23, (500,)), jnp.float32)
    a = geometry.bilinear_sample(img, x, y)
    b = geometry.tent_sample(img, x, y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-3)


def test_tent_sample_gradients_match_gather():
    rs = np.random.RandomState(4)
    img = jnp.array(rs.uniform(0, 1, (12, 14, 1)), jnp.float32)
    x = jnp.array(rs.uniform(0.2, 12.0, (64,)), jnp.float32)
    y = jnp.array(rs.uniform(0.2, 10.0, (64,)), jnp.float32)
    ga = jax.grad(lambda xx: jnp.sum(geometry.bilinear_sample(img, xx, y)**2))(x)
    gb = jax.grad(lambda xx: jnp.sum(geometry.tent_sample(img, xx, y)**2))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)


def test_pallas_tent_kernel_parity_interpret():
    # The fused Pallas warp kernel (forward + custom VJP) must match the
    # gather sampler; run in interpreter mode on CPU.
    from bihome_tpu.ops import warp_pallas
    rs = np.random.RandomState(5)
    imgs = jnp.array(rs.uniform(0, 255, (2, 24, 30, 3)), jnp.float32)
    u = jnp.array(rs.uniform(-2, 32, (2, 700)), jnp.float32)
    v = jnp.array(rs.uniform(-2, 26, (2, 700)), jnp.float32)
    got = warp_pallas.tent_sample_batched(imgs, u, v)
    want = jax.vmap(geometry.bilinear_sample)(imgs, u, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)

    # VJP parity on du/dv (the cotangents the framework consumes).
    def loss_pallas(uu, vv):
        return jnp.sum(warp_pallas.tent_sample_batched(imgs, uu, vv) ** 2)

    def loss_gather(uu, vv):
        return jnp.sum(jax.vmap(geometry.bilinear_sample)(imgs, uu, vv) ** 2)

    inner_u = jnp.clip(u, 1.2, 27.8)
    inner_v = jnp.clip(v, 1.2, 21.8)
    ga = jax.grad(loss_pallas, argnums=(0, 1))(inner_u, inner_v)
    gb = jax.grad(loss_gather, argnums=(0, 1))(inner_u, inner_v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=0.5)


def test_gauge_singularity_regression():
    # Regression: this exact (corners, delta) draw from datagen step 420 of
    # a seed-42 run makes the true homography's h33 pass through ~0; the
    # naive h33=1 normalization produced inf/NaN in float32 and NaN'd
    # training after ~400 steps.
    corners = jnp.array([[[44., 58.], [172., 58.], [172., 186.],
                          [44., 186.]]])
    delta = jnp.array([[[-23., -5.], [18., 20.], [-9., -31.], [25., 5.]]])
    h = geometry.four_point_to_homography(corners, delta)
    assert np.all(np.isfinite(np.asarray(h))), np.asarray(h)
    mapped = geometry.transform_points(h, corners)
    np.testing.assert_allclose(np.asarray(mapped),
                               np.asarray(corners + delta), atol=0.1)
    # And the warp built from it stays finite.
    img = jnp.ones((1, 240, 320, 1))
    out = geometry.warp_image(img, h, target_hw=(64, 64))
    assert np.all(np.isfinite(np.asarray(out)))


def test_tent_c1_custom_vjp_matches_autodiff():
    # The C==1 materialization-free warp backward (geometry._tent_c1) must
    # match autodiff through the plain tent formulation: d_img, du, dv.
    rs = np.random.RandomState(6)
    imgs = jnp.array(rs.uniform(0, 1, (3, 14, 18, 1)), jnp.float32)
    u = jnp.array(rs.uniform(0.3, 16.2, (3, 40)), jnp.float32)
    v = jnp.array(rs.uniform(0.3, 12.2, (3, 40)), jnp.float32)

    out_c1 = geometry._tent_c1(imgs, u, v)
    out_ref = jax.vmap(geometry.tent_sample)(imgs, u, v)
    np.testing.assert_allclose(np.asarray(out_c1), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda im, uu, vv: jnp.sum(
            fn(im, uu, vv) * jnp.sin(jnp.arange(3 * 40).reshape(3, 40, 1)))

    g_c1 = jax.grad(loss(geometry._tent_c1), argnums=(0, 1, 2))(imgs, u, v)
    g_ref = jax.grad(loss(lambda im, uu, vv: jax.vmap(geometry.tent_sample)(
        im, uu, vv)), argnums=(0, 1, 2))(imgs, u, v)
    for name, a, b in zip(['d_img', 'du', 'dv'], g_c1, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_tent_batch_grouped_batch256_regression(monkeypatch):
    # Batch-256 regression for the HBM grouping path (the shape that
    # originally fell off the cliff): force a tiny group cap so
    # _tent_batch_grouped actually groups (with padding) and must match
    # the ungrouped vmapped tent sampler exactly.
    rs = np.random.RandomState(7)
    b, h, w, c, p = 256, 10, 12, 2, 33
    imgs = jnp.array(rs.uniform(0, 255, (b, h, w, c)), jnp.float32)
    u = jnp.array(rs.uniform(-2, w + 2, (b, p)), jnp.float32)
    v = jnp.array(rs.uniform(-2, h + 2, (b, p)), jnp.float32)
    ref = jax.vmap(geometry.tent_sample)(imgs, u, v)
    # group cap = 40 images' worth of intermediate -> 7 groups, pad 24
    per_image = p * w * c * 4
    monkeypatch.setattr(geometry, '_tent_group_bytes_cache', per_image * 40)
    out = geometry._tent_batch_grouped(imgs, u, v)
    assert out.shape == (b, p, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_tent_group_bytes_device_derived(monkeypatch):
    # Env override wins; otherwise the cap derives from device HBM
    # (3/16 ratio) with the v5e constant as fallback.
    monkeypatch.setattr(geometry, '_tent_group_bytes_cache', None)
    monkeypatch.setenv('BIHOME_TENT_GROUP_BYTES', '12345678')
    assert geometry._tent_group_bytes() == 12345678
    monkeypatch.setattr(geometry, '_tent_group_bytes_cache', None)
    monkeypatch.delenv('BIHOME_TENT_GROUP_BYTES')
    got = geometry._tent_group_bytes()
    stats = jax.devices()[0].memory_stats() or {}
    if stats.get('bytes_limit'):
        assert got == max(256 * 1024 * 1024,
                          int(stats['bytes_limit']) * 3 // 16)
    else:
        assert got == geometry._TENT_GROUP_BYTES_V5E
