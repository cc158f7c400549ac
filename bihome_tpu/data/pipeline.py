"""On-device synthetic homography-pair generation (the datagen hot path).

TPU-native replacement for the reference's CPU DataLoader-worker chain
``HomographyNetPrep -> DictToGrayscale -> DictStandardize -> DictToTensor``
(ref: src/data/transforms.py:421-743, SURVEY §3.3). One jit-compiled,
PRNG-keyed function maps a uint8 image batch to a training batch dict:

  photometric distortion (per copy) -> random patch position -> random corner
  perturbation delta -> 4pt homography -> perspective warp -> patch crops ->
  target ('4_points' delta or 'all_points' dense perspective field) ->
  grayscale -> standardization.

Differences from the reference, by design (documented for parity review):
  * Runs batched on the accelerator instead of per-sample in 8 worker
    processes; randomness is jax.random (distribution-parity, not
    bit-parity, with np.random.RandomState — see SURVEY §7 hard part 3).
  * patch_2 is sampled directly at the warped patch grid instead of warping
    the full image then cropping — mathematically identical (the reference
    warps 240x320 then slices 128x128; we sample exactly the 128x128 patch
    coords from a (ps+2rho)^2 window). Photometric distortion and grayscale
    also run window-first. Full images are only materialized when a consumer
    (PhotometricHead, visualization) asks for them.
  * Layout is NHWC (TPU-native) instead of NCHW; DictToTensor's transpose
    is therefore a no-op here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from bihome_tpu import geometry
from bihome_tpu.data import photometric
from bihome_tpu.ops import color

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PairSpec:
    """Static datagen configuration (hashable -> usable as a jit static arg).

    Field semantics follow HomographyNetPrep's ctor args
    (ref: src/data/transforms.py:441-454) plus the grayscale/standardize
    transforms parsed from the config TRANSFORMS list.
    """
    rho: int = 32
    patch_size: int = 128
    photometric_keys: Tuple[str, ...] = ('image_1', 'image_2')
    max_delta: float = 32.0
    target_gen: str = '4_points'            # '4_points' | 'all_points'
    grayscale_keys: Tuple[str, ...] = ('patch_1', 'patch_2')
    standardize_mean: float = 0.443
    standardize_std: float = 0.129
    standardize_keys: Tuple[str, ...] = ('patch_1', 'patch_2')
    # Which of the full-size images to materialize in the output batch.
    # ('patch_*', 'delta', 'corners', 'target' are always produced.)
    emit_images: Tuple[str, ...] = ()
    # ChangeAwarePrep keys (ref: src/data/transforms.py:399-418): when set,
    # datagen consumes REAL image pairs [B,2,H,W,3] (CLEVR-Change original/
    # changed renders) instead of synthesizing a homography pair.
    change_aware_keys: Tuple[str, ...] = ()
    # Blob occlusion augmentation (CollatorWithBlobs equivalent; enabled by
    # DATA.AUGMENT_BLOB_POROSITY / AUGMENT_BLOBINESS, ref: train.py:574-577).
    blob_porosity: float = 0.0
    blobiness: float = 1.0
    # Dtype of the patch_2 tent-warp source ('float32' | 'bfloat16').
    # When the model's compute dtype is bf16, patches are cast to bf16 at
    # the first conv anyway, so sampling in bf16 loses nothing downstream
    # while halving the dominant [P,W] tent-contraction HBM traffic
    # (train-time only; the eval/test spec stays float32).
    warp_dtype: str = 'float32'
    # Host-side pre-datagen transforms parsed from TRANSFORMS entries that
    # precede HomographyNetPrep in the reference's (images, target) tuple
    # stage: (ClassName, ctor_args) pairs consumed by
    # transforms_host.build_host_prep and applied per image by the dataset
    # loaders (ref: train.py:110-120 accepts any transform class by name).
    host_prep: Tuple[Tuple[str, Tuple[Any, ...]], ...] = ()
    # Dict-stage full-SSD PhotometricDistort keys
    # (ref: src/data/transforms.py:265-293): applied on-device after pair
    # assembly, before grayscale/standardize (the reference list order).
    photometric_full_keys: Tuple[str, ...] = ()

    @staticmethod
    def from_transforms(transforms: Sequence[Dict[str, List[Any]]],
                        emit_images: Sequence[str] = ()) -> 'PairSpec':
        """Build from a reference-format TRANSFORMS yaml list.

        Each entry is {ClassName: [args...]} as produced by yaml.full_load on
        the reference configs (ref: train.py:110-120). The full reference
        vocabulary (src/data/transforms.py:11-743) is accepted:
        HomographyNetPrep / ChangeAwarePrep and the Dict* stages map onto the
        on-device datagen; Rescale / RandomCrop / CenterCrop / ToGrayscale /
        Standardize become host-side per-image prep (``host_prep``);
        PhotometricDistort becomes the on-device full-SSD chain
        (``photometric_full_keys``); the tensor-layout transforms are no-ops
        in NHWC.
        """
        kwargs: Dict[str, Any] = {}
        host_prep: List[Tuple[str, Tuple[Any, ...]]] = []
        for entry in transforms:
            (name, args), = entry.items()
            if name == 'HomographyNetPrep':
                kwargs['rho'] = int(args[0])
                kwargs['patch_size'] = int(args[1])
                kwargs['photometric_keys'] = tuple(args[2] or ())
                if len(args) > 3:
                    kwargs['max_delta'] = float(args[3])
                if len(args) > 4:
                    kwargs['target_gen'] = str(args[4])
            elif name == 'DictToGrayscale':
                kwargs['grayscale_keys'] = tuple(args[0])
            elif name == 'DictStandardize':
                mean, std = args[0], args[1]
                kwargs['standardize_mean'] = float(
                    mean[0] if isinstance(mean, (list, tuple)) else mean)
                kwargs['standardize_std'] = float(
                    std[0] if isinstance(std, (list, tuple)) else std)
                kwargs['standardize_keys'] = tuple(args[2])
            elif name == 'ChangeAwarePrep':
                keys = tuple(args[0]) if args and args[0] else (
                    'patch_1', 'patch_2')
                kwargs['change_aware_keys'] = keys
            elif name in ('DictToTensor', 'ToTensorWithTarget'):
                pass  # NHWC layout throughout; nothing to do.
            elif name == 'PhotometricDistort':
                kwargs['photometric_full_keys'] = tuple(args[0])
            elif name in ('Rescale', 'RandomCrop', 'CenterCrop'):
                size = args[0]
                size = tuple(size) if isinstance(size, (list, tuple)) else size
                host_prep.append((name, (size,)))
            elif name == 'ToGrayscale':
                host_prep.append((name, ()))
            elif name == 'Standardize':
                host_prep.append((name, (args[0], args[1])))
            else:
                raise ValueError(f'Unknown transform in config: {name}')
        return PairSpec(emit_images=tuple(emit_images),
                        host_prep=tuple(host_prep), **kwargs)


def _sample_patch_position(key: Array, batch: int, image_hw: Tuple[int, int],
                           spec: PairSpec) -> Tuple[Array, Array]:
    """Random patch-center (pos_x, pos_y) per sample
    (ref: src/data/transforms.py:504-509)."""
    h, w = image_hw
    ps, rho = spec.patch_size, spec.rho
    kx, ky = jax.random.split(key)
    if ps != w:
        pos_x = jax.random.randint(kx, (batch,), rho + ps // 2,
                                   w - rho - ps // 2 + 1)
        pos_y = jax.random.randint(ky, (batch,), rho + ps // 2,
                                   h - rho - ps // 2 + 1)
    else:
        pos_x = jnp.full((batch,), w // 2, jnp.int32)
        pos_y = jnp.full((batch,), h // 2, jnp.int32)
    return pos_x, pos_y


def _corners_from_position(pos_x: Array, pos_y: Array,
                           patch_size: int) -> Array:
    """[(x0,y0),(x1,y0),(x1,y1),(x0,y1)] per sample
    (ref: src/data/transforms.py:517-520)."""
    half = patch_size // 2
    x0 = pos_x - half
    x1 = pos_x + half
    y0 = pos_y - half
    y1 = pos_y + half
    return jnp.stack([
        jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
        jnp.stack([x1, y1], -1), jnp.stack([x0, y1], -1)], axis=1)


def _extract_patches(images: Array, x0: Array, y0: Array,
                     patch_size: int) -> Array:
    """Batched static-size crop [B,H,W,C] -> [B,ps,ps,C] at per-sample
    integer offsets (factorized one-hot contractions; a vmapped
    lax.dynamic_slice compiles to a PER-SAMPLE while loop of
    dynamic-update-slices at batch > 64 — profiled at ~2s/step)."""
    return geometry.crop_integer(images, x0, y0, (patch_size, patch_size))


def _warp_patches(images: Array, homography: Array, corners0: Array,
                  patch_size: int, rho: int) -> Array:
    """Sample the warped second patches directly (batched).

    Equivalent to warp_image(image, H)[y0:y0+ps, x0:x0+ps] per sample
    (ref: src/data/transforms.py:573-576) but samples only the patch pixels:
    patch(i, j) = image(H · (x0+j, y0+i)).

    Every source coordinate lies inside the quadrilateral with vertices
    corners+delta (homographies map the convex patch square into it), which
    is contained in the patch grown by rho — so only a static (ps+2·rho)²
    window participates; the window is extracted with the factorized
    one-hot crop (NOT dynamic_slice, which serializes per-sample at
    batch > 64) and sampled with one batched fused warp.
    """
    ps = patch_size
    b, h, w, c = images.shape
    ws_x = min(ps + 2 * rho, w)
    ws_y = min(ps + 2 * rho, h)
    ox = jnp.clip(corners0[:, 0].astype(jnp.int32) - rho, 0, w - ws_x)
    oy = jnp.clip(corners0[:, 1].astype(jnp.int32) - rho, 0, h - ws_y)
    windows = geometry.crop_integer(images, ox, oy, (ws_y, ws_x))
    u, v = geometry.homography_grid(homography, (ps, ps),
                                    offset=corners0.astype(jnp.float32))
    u = u - ox.astype(jnp.float32)[:, None]
    v = v - oy.astype(jnp.float32)[:, None]
    out = geometry.batched_sample(windows, u, v)
    return out.reshape(b, ps, ps, c)


def _perspective_field(homography: Array, corners0: Array,
                       patch_size: int) -> Array:
    """Dense 'all_points' target cropped to the patch: pf(p) = H·p − p at
    absolute image coords p (ref: src/data/transforms.py:635-685).
    Returns [ps,ps,2] (x-diff, y-diff)."""
    ps = patch_size
    ys, xs = jnp.meshgrid(jnp.arange(ps, dtype=jnp.float32),
                          jnp.arange(ps, dtype=jnp.float32), indexing='ij')
    xa = xs.reshape(-1) + corners0[0]
    ya = ys.reshape(-1) + corners0[1]
    pts = jnp.stack([xa, ya], axis=-1)                         # [ps*ps, 2]
    mapped = geometry.transform_points(homography[None], pts[None])[0]
    diff = mapped - pts
    return diff.reshape(ps, ps, 2)


def generate_pairs_deterministic(
        image: Array, corners: Array, delta: Array, spec: PairSpec,
        image_1: Optional[Array] = None,
        image_2: Optional[Array] = None,
        pdf_keys: Optional[Array] = None) -> Dict[str, Array]:
    """Deterministic pair assembly given sampled (corners, delta).

    Split from :func:`generate_pairs` so golden tests can inject fixed
    randomness and compare against an independent numpy implementation.
    image/image_1/image_2: [B,H,W,3] float (image_1/2 default to image —
    i.e. no photometric distortion). corners: [B,4,2] float (int-valued),
    delta: [B,4,2] float. pdf_keys: [B] PRNG keys for the dict-stage
    full-SSD PhotometricDistort (``spec.photometric_full_keys``); None
    skips it.
    """
    if image_1 is None:
        image_1 = image
    if image_2 is None:
        image_2 = image
    ps = spec.patch_size
    x0 = corners[:, 0, 0].astype(jnp.int32)
    y0 = corners[:, 0, 1].astype(jnp.int32)

    pdf_keys_active = (spec.photometric_full_keys if pdf_keys is not None
                       else ())

    # Grayscale commutes with cropping and with bilinear warping (both are
    # linear in pixel values), so convert BEFORE the warp when the patch is
    # grayscaled anyway — 3x fewer sampled channels on the hot path. Keys
    # still awaiting the (non-linear) full photometric chain, and sources a
    # host-side ToGrayscale already converted, are excluded.
    patch_1_gray = ('patch_1' in spec.grayscale_keys
                    and 'patch_1' not in pdf_keys_active
                    and image_1.shape[-1] == 3)
    patch_2_gray = ('patch_2' in spec.grayscale_keys
                    and 'patch_2' not in pdf_keys_active
                    and image_2.shape[-1] == 3)
    patch_1_src = (color.rgb_to_grayscale(image_1) if patch_1_gray
                   else image_1)
    patch_2_src = (color.rgb_to_grayscale(image_2) if patch_2_gray
                   else image_2)

    patch_1 = _extract_patches(patch_1_src, x0, y0, ps)

    homography = geometry.four_point_to_homography(corners, delta)
    if spec.warp_dtype == 'bfloat16':
        patch_2_src = patch_2_src.astype(jnp.bfloat16)
    patch_2 = _warp_patches(patch_2_src, homography,
                            corners[:, 0].astype(jnp.float32), ps, spec.rho)
    patch_2 = patch_2.astype(jnp.float32)

    batch: Dict[str, Array] = {
        'patch_1': patch_1,
        'patch_2': patch_2,
        'corners': corners.astype(jnp.float32),
        'delta': delta.astype(jnp.float32),
        'homography': homography,
    }

    if spec.target_gen == '4_points':
        batch['target'] = batch['delta']
    elif spec.target_gen == 'all_points':
        batch['target'] = jax.vmap(_perspective_field,
                                   in_axes=(0, 0, None))(
            homography, corners[:, 0].astype(jnp.float32), ps)
    else:
        raise ValueError(f'Unknown target_gen: {spec.target_gen}')

    if 'image_1' in spec.emit_images:
        batch['image_1'] = image_1
    if 'image_2' in spec.emit_images:
        # Only here do we pay for the full-image warp (vis / photometric-eval).
        batch['image_2'] = geometry.warp_image(image_2, homography)

    # Dict-stage full-SSD photometric chain (PhotometricDistort config
    # transform) — before grayscale/standardize, the reference list order.
    if pdf_keys is not None and spec.photometric_full_keys:
        for i, name in enumerate(spec.photometric_full_keys):
            if name in batch:
                per_key = jax.vmap(
                    lambda k, i=i: jax.random.fold_in(k, i))(pdf_keys)
                batch[name] = jax.vmap(photometric.photometric_distort_full)(
                    batch[name], per_key)

    # Grayscale then standardize, mirroring the transform order
    # (ref: config TRANSFORMS lists). patch_1/patch_2 were pre-grayscaled
    # above (linearity), so only remaining keys convert here.
    for key in spec.grayscale_keys:
        if key in batch and batch[key].shape[-1] != 1:
            batch[key] = color.rgb_to_grayscale(batch[key])
    for key in spec.standardize_keys:
        if key in batch:
            batch[key] = (batch[key] / 255.0
                          - spec.standardize_mean) / spec.standardize_std
    return batch


def take_images(pool: Array, idx: Array) -> Array:
    """Gather ``pool[idx]`` as a one-hot MXU contraction.

    A row gather of [N,H,W,3] uint8 images scalarizes on TPU (profiled at
    ~6 ms/step for 64x230KB rows — 13% of a zeng-bihome step); the one-hot
    matmul reads the pool once through the MXU instead. Exact: uint8 values
    (0..255) are representable in bf16 (8 significand bits) and each output
    element sums exactly one nonzero product.
    """
    if jax.default_backend() != 'tpu':
        return jnp.take(pool, idx, axis=0)
    n = pool.shape[0]
    oh = jax.nn.one_hot(idx, n, dtype=jnp.bfloat16)            # [B,N]
    flat = pool.reshape(n, -1)
    out = jnp.dot(oh, flat.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    if jnp.issubdtype(pool.dtype, jnp.integer):
        # Keep the dot's f32 output: every consumer (generate_pairs)
        # immediately converts to f32 anyway, so the uint8 round-trip
        # would only add a cast + layout copies of the full image batch.
        return out.reshape((idx.shape[0],) + pool.shape[1:])
    return out.astype(pool.dtype).reshape((idx.shape[0],) + pool.shape[1:])


def assemble_change_pairs(pairs: Array, spec: PairSpec) -> Dict[str, Array]:
    """ChangeAwarePrep equivalent (ref: src/data/transforms.py:399-418):
    real (original, changed) render pairs [B,2,H,W,3] -> batch dict keyed by
    ``spec.change_aware_keys`` with grayscale/standardize applied."""
    k1, k2 = spec.change_aware_keys[:2]
    imgs = pairs.astype(jnp.float32)
    batch: Dict[str, Array] = {k1: imgs[:, 0], k2: imgs[:, 1]}
    for key in spec.grayscale_keys:
        if key in batch and batch[key].shape[-1] != 1:
            batch[key] = color.rgb_to_grayscale(batch[key])
    for key in spec.standardize_keys:
        if key in batch:
            batch[key] = (batch[key] / 255.0
                          - spec.standardize_mean) / spec.standardize_std
    return batch


def generate_pairs(images: Array, key: Array,
                   spec: PairSpec) -> Dict[str, Array]:
    """Full randomized datagen: uint8/float images [B,H,W,3] + key -> batch.

    The TPU-native HomographyNetPrep (ref: src/data/transforms.py:456-725).
    With ``spec.change_aware_keys`` set, ``images`` is [B,2,H,W,3] of real
    pairs and the ChangeAwarePrep path is taken instead.
    """
    if spec.change_aware_keys:
        return assemble_change_pairs(images, spec)
    images = images.astype(jnp.float32)
    b, h, w, _ = images.shape
    k_pd1, k_pd2, k_pos, k_delta = jax.random.split(key, 4)

    pos_x, pos_y = _sample_patch_position(k_pos, b, (h, w), spec)
    corners = _corners_from_position(pos_x, pos_y, spec.patch_size)
    # randint(-rho, rho) — high-exclusive, matching np.random.randint
    # (ref: src/data/transforms.py:538).
    delta = jax.random.randint(k_delta, (b, 4, 2), -spec.rho, spec.rho)

    pdf_keys = (jax.random.split(jax.random.fold_in(key, 13), b)
                if spec.photometric_full_keys else None)
    batch = _assemble_pairs(images, corners, delta,
                            jax.random.split(k_pd1, b),
                            jax.random.split(k_pd2, b), spec,
                            pdf_keys=pdf_keys)

    if spec.blob_porosity > 0 and b > 1:
        from bihome_tpu.data import blobs
        k_blob = jax.random.fold_in(key, 7)
        batch = blobs.apply_blob_augmentation(
            batch, k_blob, porosity=spec.blob_porosity,
            blobiness=spec.blobiness)
    return batch


def generate_pairs_per_sample(images: Array, keys: Array,
                              spec: PairSpec) -> Dict[str, Array]:
    """Like :func:`generate_pairs` but every sample's randomness derives
    ONLY from its own key (``keys`` [B] stacked PRNG keys).

    This makes pair synthesis invariant to how samples are grouped into
    batches — the property the reference eval protocol gets from seeded
    per-sample transforms (ref: eval.py:360, transforms.py:448-454) — so
    eval MACE is identical at --batch_size 1 and 64 for a fixed seed.
    """
    images = images.astype(jnp.float32)
    b, h, w, _ = images.shape
    ps, rho = spec.patch_size, spec.rho
    sub = jax.vmap(lambda k: jax.random.split(k, 4))(keys)     # [B,4,key]
    k_pd1, k_pd2, k_pos, k_delta = (sub[:, i] for i in range(4))

    if ps != w:
        def pos(k):
            kx, ky = jax.random.split(k)
            px = jax.random.randint(kx, (), rho + ps // 2,
                                    w - rho - ps // 2 + 1)
            py = jax.random.randint(ky, (), rho + ps // 2,
                                    h - rho - ps // 2 + 1)
            return px, py
        pos_x, pos_y = jax.vmap(pos)(k_pos)
    else:
        pos_x = jnp.full((b,), w // 2, jnp.int32)
        pos_y = jnp.full((b,), h // 2, jnp.int32)
    corners = _corners_from_position(pos_x, pos_y, ps)
    delta = jax.vmap(
        lambda k: jax.random.randint(k, (4, 2), -rho, rho))(k_delta)
    pdf_keys = (jax.vmap(lambda k: jax.random.fold_in(k, 13))(keys)
                if spec.photometric_full_keys else None)
    return _assemble_pairs(images, corners, delta, k_pd1, k_pd2, spec,
                           pdf_keys=pdf_keys)


def _assemble_pairs(images: Array, corners: Array, delta: Array,
                    pd1_keys: Array, pd2_keys: Array,
                    spec: PairSpec,
                    pdf_keys: Optional[Array] = None) -> Dict[str, Array]:
    """Shared post-randomness assembly: photometric distortion + patch
    extraction/warp, window-first when no full images are emitted."""
    b, h, w, _ = images.shape

    def distort(imgs, keys):
        return jax.vmap(photometric.photometric_distort_simple,
                        in_axes=(0, 0, None))(imgs, keys, spec.max_delta)

    pd1 = 'image_1' in spec.photometric_keys and spec.max_delta > 0
    pd2 = 'image_2' in spec.photometric_keys and spec.max_delta > 0

    if not spec.emit_images:
        # Window-first fast path: everything downstream (patch_1 crop,
        # patch_2 warp) reads only the (ps+2·rho)² window around the patch
        # (convexity bound, see _warp_patches), so photometric distortion and
        # grayscale run on ~half the pixels. Per-sample photometric params
        # are pixel-independent, so distort(window) == distort(image)|window.
        ps = spec.patch_size
        ws_x = min(ps + 2 * spec.rho, w)
        ws_y = min(ps + 2 * spec.rho, h)
        ox = jnp.clip(corners[:, 0, 0] - spec.rho, 0, w - ws_x)
        oy = jnp.clip(corners[:, 0, 1] - spec.rho, 0, h - ws_y)
        windows = geometry.crop_integer(images, ox, oy, (ws_y, ws_x))
        win_1 = distort(windows, pd1_keys) if pd1 else windows
        win_2 = distort(windows, pd2_keys) if pd2 else windows
        origin = jnp.stack([ox, oy], axis=-1)[:, None, :]      # [B,1,2]
        corners_local = (corners - origin).astype(jnp.float32)
        batch = generate_pairs_deterministic(
            windows, corners_local, delta.astype(jnp.float32),
            spec, image_1=win_1, image_2=win_2, pdf_keys=pdf_keys)
        # Restore absolute-frame outputs (diff-field targets and patches are
        # translation-invariant; corners/homography are frame-dependent).
        batch['corners'] = corners.astype(jnp.float32)
        batch['homography'] = geometry.four_point_to_homography(
            batch['corners'], batch['delta'])
    else:
        image_1 = distort(images, pd1_keys) if pd1 else images
        image_2 = distort(images, pd2_keys) if pd2 else images
        batch = generate_pairs_deterministic(
            images, corners.astype(jnp.float32), delta.astype(jnp.float32),
            spec, image_1=image_1, image_2=image_2, pdf_keys=pdf_keys)
    return batch
