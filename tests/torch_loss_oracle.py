"""Independent torch oracle for the biHomE / Zhang triplet LOSS VALUES.

This is NOT a port of the reference code: it re-assembles the published
loss definitions (biHomE double/one-line triplet, ref:
src/heads/PerceptualHead.py:320-714; Zhang CA-UDHN triplet, ref:
src/heads/TripletHead.py:37-199) from torch primitives, with warps going
through ``tests.oracles`` (float64 8x8 homography solve + torch
grid_sample) — an implementation path fully disjoint from
``bihome_tpu.geometry`` / ``heads.assembled``. Used by
tests/test_loss_golden.py to pin the loss VALUES (not just properties)
of the JAX implementation against the reference math with shared,
ported extractor weights.

All tensors here are torch NCHW float32 unless noted.
"""

import numpy as np
import torch

from tests import oracles


def corners_of(size):
    """Patch corners [[0,0],[s,0],[s,s],[0,s]] (square patches; the
    reference's H/W transposition in image_shape_to_corners is moot)."""
    s = float(size)
    return np.array([[0.0, 0.0], [s, 0.0], [s, s], [0.0, s]], np.float64)


def warp_batch(images, deltas):
    """Warp NCHW images by the per-sample homography taking patch corners
    to corners + delta. dst(x) = bilinear(src, H @ x), zeros outside
    (reference semantics: warp_image(img, H, inverse=True) ==
    kornia.warp_perspective(img, H^-1), ref: src/data/utils.py:54-67).

    Returns (warped [B,C,H,W] torch, homographies [B,3,3] float64 np).
    """
    b, c, h, w = images.shape
    crn = corners_of(h)
    out = np.zeros((b, c, h, w), np.float32)
    hs = np.zeros((b, 3, 3), np.float64)
    img_np = images.detach().numpy()
    for i in range(b):
        hom = oracles.solve_homography_4pt(
            crn, crn + np.asarray(deltas[i], np.float64))
        hs[i] = hom
        hwc = img_np[i].transpose(1, 2, 0)
        out[i] = oracles.warp_image_torch(hwc, hom, (h, w)).transpose(2, 0, 1)
    return torch.from_numpy(out), hs


def _downsample_masks(masks, factor):
    if factor <= 1:
        return masks
    pool = torch.nn.AvgPool2d(kernel_size=factor, stride=factor, padding=0)
    return pool(masks)


def _margin_aggregate(l_pos, l_anchor, margin, aggregation, channels_quirk):
    """Channel aggregation + hinge on [B,C,h,w] distances -> [B,h,w].

    ``channels_quirk``: multiply a float margin by the channel count
    (the reference's hardcoded *64 on the SECOND double-line element,
    ref: src/heads/PerceptualHead.py:647-649).
    """
    if isinstance(margin, str):          # 'inf' -> no hinge
        if aggregation == 'channel-aware':
            return torch.sum(l_pos - l_anchor, dim=1)
        return torch.sum(l_pos, dim=1) - torch.sum(l_anchor, dim=1)
    if aggregation == 'channel-aware':
        return torch.sum(torch.clamp(l_pos - l_anchor + margin, min=0.0),
                         dim=1)
    eff = margin * l_pos.shape[1] if channels_quirk else margin
    return torch.clamp(torch.sum(l_pos, dim=1) - torch.sum(l_anchor, dim=1)
                       + eff, min=0.0)


def _masked_mean_sum(mask_a, mask_b, loss_mat):
    """sum(mask_a*mask_b*loss)/max(sum(mask_a*mask_b),1) per sample, then
    sum over batch (the Zhang normalization both heads share)."""
    den = torch.sum(mask_a * mask_b, dim=(-2, -1))
    num = torch.sum(mask_a * mask_b * loss_mat, dim=(-2, -1))
    return torch.sum(num / torch.clamp(den, min=1.0))


def bihome_loss(extractor, patch_1, patch_2, delta_12, delta_21=None,
                mask_1=None, mask_2=None, triplet_loss='double-line',
                triplet_margin='inf', triplet_aggregation='channel-aware',
                triplet_distance='l1', triplet_mu=0.01, mask_crd=False,
                upsample_scale=1, normalize_features=False,
                dual_extractor=None):
    """The PerceptualHead triplet loss (delta_hat mode, hypothesis_no=1).

    extractor: callable NCHW [B,1,i,i] -> NCHW features (frozen, eval).
    Returns (total, components) with components = {'ln1','ln2','ln3'}
    (double-line) or {} (one-line); plus 'dual' when dual_extractor is set.

    upsample_scale: SAMPLING_STRATEGY='upsample-patch-{2,4}x' — bilinear
    align_corners=True upsample before the extractor
    (ref: PerceptualHead.py:317-318,353-377).
    normalize_features: WITH_PROJECTION_HEAD's per-pixel channel L2
    normalization in the one-line loss (ref: PerceptualHead.py:470-497).
    dual_extractor: 'dual' variant's backbone feature extractor; the dual
    loss element uses FULL-resolution masks and no hinge
    (ref: PerceptualHead.py:407-441).
    """
    if mask_1 is None:
        mask_1 = torch.ones_like(patch_1)
    if mask_2 is None:
        mask_2 = torch.ones_like(patch_2)
    doubleline = 'double-line' in triplet_loss

    def up(x):
        if upsample_scale <= 1:
            return x
        return torch.nn.Upsample(scale_factor=upsample_scale,
                                 mode='bilinear', align_corners=True)(x)

    patch_1_prime, h1 = warp_batch(patch_1, delta_12)
    mask_1_prime, _ = warp_batch(mask_1, delta_12)
    with torch.no_grad():
        f1 = extractor(up(patch_1))
        f2 = extractor(up(patch_2))
        f1p = extractor(up(patch_1_prime))
    if doubleline:
        patch_2_prime, h2 = warp_batch(patch_2, delta_21)
        mask_2_prime, _ = warp_batch(mask_2, delta_21)
        with torch.no_grad():
            f2p = extractor(up(patch_2_prime))

    dual = 0.0
    if dual_extractor is not None:
        with torch.no_grad():
            f1d = dual_extractor(patch_1)
            f2d = dual_extractor(patch_2)
            f1pd = dual_extractor(patch_1_prime)
        l1d = torch.sum(torch.abs(f1pd - f2d), dim=1)
        l3d = torch.sum(torch.abs(f1d - f2d), dim=1)
        dual = float(_masked_mean_sum(mask_1_prime[:, 0], mask_2[:, 0],
                                      l1d - l3d))
        if doubleline:
            with torch.no_grad():
                f2pd = dual_extractor(patch_2_prime)
            l2d = torch.sum(torch.abs(f2pd - f1d), dim=1)
            dual += float(_masked_mean_sum(mask_2_prime[:, 0],
                                           mask_1[:, 0], l2d - l3d))

    factor = patch_1.shape[-1] // f1.shape[-1]
    m1p = _downsample_masks(mask_1_prime, factor)[:, 0]
    m2 = _downsample_masks(mask_2, factor)[:, 0]
    if doubleline:
        m1 = _downsample_masks(mask_1, factor)[:, 0]
        m2p = _downsample_masks(mask_2_prime, factor)[:, 0]

    if 'one-line' in triplet_loss:
        if normalize_features:
            def norm(f):
                return f / torch.norm(f, p=2, dim=1, keepdim=True)
            f1p, f2, f1 = norm(f1p), norm(f2), norm(f1)
        if triplet_distance == 'l1':
            l1 = torch.sum(torch.abs(f1p - f2), dim=1)
            l3 = torch.sum(torch.abs(f1 - f2), dim=1)
        elif triplet_distance == 'cosine':
            l1 = 1.0 - torch.cosine_similarity(f1p, f2, dim=1)
            l3 = 1.0 - torch.cosine_similarity(f1, f2, dim=1)
        else:
            raise ValueError(triplet_distance)
        margin = triplet_margin if not isinstance(triplet_margin, str) else 0.0
        loss_mat = torch.clamp(l1 - l3 + margin, min=0.0)
        if mask_crd:
            den = torch.sum(m1p, dim=(-2, -1))
            num = torch.sum(m1p * loss_mat, dim=(-2, -1))
            return (float(torch.sum(num / torch.clamp(den, min=1.0))) + dual,
                    {'dual': dual})
        return (float(_masked_mean_sum(m1p, m2, loss_mat)) + dual,
                {'dual': dual})

    # double-line (l1 distance; the reference's l2/cosine double-line path
    # shape-errors, see test_loss_golden.py note)
    l1 = torch.abs(f1p - f2)
    l2 = torch.abs(f2p - f1)
    l3 = torch.abs(f1 - f2)
    loss_mat_1 = _margin_aggregate(l1, l3, triplet_margin,
                                   triplet_aggregation, channels_quirk=False)
    loss_mat_2 = _margin_aggregate(l2, l3, triplet_margin,
                                   triplet_aggregation, channels_quirk=True)
    ln1 = float(_masked_mean_sum(m1p, m2, loss_mat_1))
    ln2 = float(_masked_mean_sum(m2p, m1, loss_mat_2))
    eye = np.eye(3)[None]
    ln3 = float(np.sum((np.matmul(h1, h2) - eye) ** 2))
    total = ln1 + ln2 + triplet_mu * ln3 + dual
    return total, {'ln1': ln1, 'ln2': ln2, 'ln3': triplet_mu * ln3,
                   'dual': dual}


def zhang_triplet_loss(feature_extractor, patch_1, patch_2, mask_1, mask_2,
                       feature_1, feature_2, delta_12, delta_21=None,
                       variant='doubleline', triplet_margin=1.0,
                       triplet_aggregation='channel-agnostic', mu=0.01):
    """The Zhang CA-UDHN triplet loss (ref: src/heads/TripletHead.py:37-199).

    feature_extractor: callable NCHW -> NCHW learned features; feature_1/2
    are the UNWARPED features the backbone already computed. Masks are
    full-resolution (the CA mask predictor output matches the feature map).
    Returns a python float.
    """
    patch_1_prime, h1 = warp_batch(patch_1, delta_12)
    f1p = feature_extractor(patch_1_prime)
    mask_1_prime, _ = warp_batch(mask_1, delta_12)

    l1 = torch.abs(f1p - feature_2)
    l3 = torch.abs(feature_1 - feature_2)
    loss_mat_1 = _margin_aggregate(l1, l3, triplet_margin,
                                   triplet_aggregation, channels_quirk=False)
    ln1 = _masked_mean_sum(mask_1_prime[:, 0], mask_2[:, 0], loss_mat_1)
    if variant != 'doubleline':
        return float(ln1)

    patch_2_prime, h2 = warp_batch(patch_2, delta_21)
    f2p = feature_extractor(patch_2_prime)
    mask_2_prime, _ = warp_batch(mask_2, delta_21)
    l2 = torch.abs(f2p - feature_1)
    loss_mat_2 = _margin_aggregate(l2, l3, triplet_margin,
                                   triplet_aggregation, channels_quirk=False)
    ln2 = _masked_mean_sum(mask_2_prime[:, 0], mask_1[:, 0], loss_mat_2)
    eye = np.eye(3)[None]
    ln3 = float(np.sum((np.matmul(h1, h2) - eye) ** 2))
    return float(ln1 + ln2) + mu * ln3
