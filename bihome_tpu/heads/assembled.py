"""AssembledModel: backbone + loss head as one flax module.

Replaces the reference's ``torch.nn.Sequential(backbone, head)`` + data-dict
threading (ref: train.py:696, SURVEY §2.4). The backbone writes outputs for
its TARGET_KEYS; the head turns them into either

  * ``{'ground_truth', 'network_output', 'delta_gt', 'delta_hat'}`` — for
    trainer-applied tensor losses (MSE / L1 / SmoothL1 / CosineDistance), or
  * ``{'loss', 'delta_gt', 'delta_hat'}`` — for self-computed losses
    (TripletLoss / iHomE / biHomE),

mirroring the reference loss dispatch (ref: train.py:316-376). A ``metrics``
dict of scalars replaces the summary-writer-inside-the-data-dict hack
(ref: train.py:312-314, PerceptualHead.py:678-697).

TPU-first details:
  * biHomE's four frozen-extractor passes run as ONE stacked [4·B·n] pass
    (ref runs them sequentially: PerceptualHead.py:352-398) — the single
    biggest arithmetic-intensity win of the rebuild.
  * All warps go through geometry.batched_sample (MXU tent contractions).
  * DSAC sampling/scoring is batched over hypotheses (heads/dsac.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bihome_tpu import geometry
from bihome_tpu.heads import dsac as dsac_lib
from bihome_tpu.heads import ransac as ransac_lib
from bihome_tpu.heads.config import HeadConfig
from bihome_tpu.models.resnet import ResNet
from bihome_tpu.ops import fused_loss

Array = jax.Array


def _upsample_align_corners(x: Array, scale: int) -> Array:
    """Bilinear 2x/4x upsample with torch align_corners=True semantics
    (ref: PerceptualHead.py:317-318)."""
    b, h, w, c = x.shape
    oh, ow = h * scale, w * scale
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    gx, gy = jnp.meshgrid(xs, ys)
    u = jnp.broadcast_to(gx.reshape(1, -1), (b, oh * ow))
    v = jnp.broadcast_to(gy.reshape(1, -1), (b, oh * ow))
    return geometry.batched_sample(x, u, v).reshape(b, oh, ow, c)


def _avg_pool(x: Array, factor: int) -> Array:
    """AvgPool2d(kernel=stride=factor) — mask downsampling
    (ref: PerceptualHead.py:447-459)."""
    if factor <= 1:
        return x
    return nn.avg_pool(x, (factor, factor), strides=(factor, factor))


class AssembledModel(nn.Module):
    backbone: nn.Module
    head: HeadConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.head
        if cfg.name == 'PerceptualHead':
            self.auxiliary_resnet = ResNet(
                arch=cfg.auxiliary_resnet,
                output_layer=cfg.auxiliary_resnet_output_layer,
                dtype=self.dtype, name='auxiliary_resnet')
            if cfg.with_projection_head:
                self.projection_head = [
                    nn.Dense(out_dim, dtype=self.dtype,
                             name=f'projection_{i}')
                    for i, (_, out_dim) in enumerate(cfg.with_projection_head)]
            if not cfg.delta_hat_keys and cfg.scoring_method == 'score_cnn':
                self.score_cnn = ResNet(arch='resnet18', num_classes=1,
                                        dtype=self.dtype, name='score_cnn')

    # ------------------------------------------------------------------ #
    # Shared helpers
    # ------------------------------------------------------------------ #

    def _aux_features(self, x: Array, train: bool) -> Array:
        """Frozen-extractor features: truncated resnet, optional projection
        head (ref: PerceptualHead.py:50-76).

        The reference repeats grayscale to 3 channels to reuse the ImageNet
        stem (PerceptualHead.py:56-60); since the three channels are
        identical, conv1(repeat(x)) == conv1'(x) with the kernel summed over
        input channels — so grayscale input feeds a 1-channel stem directly
        (the torch importer sums the ImageNet conv1 kernel accordingly,
        torch_port.port_torchvision_resnet(sum_rgb_stem=True)). Exact same
        math, a third of the stem FLOPs, no [4B,H,W,3] materialization."""
        cfg = self.head
        bn_train = train and cfg.auxiliary_resnet_bn_train
        f = self.auxiliary_resnet(x, train=bn_train)
        if cfg.with_projection_head:
            for i, layer in enumerate(self.projection_head):
                f = layer(f)
                if i != len(self.projection_head) - 1:
                    f = nn.relu(f)
        return f

    @staticmethod
    def _warp(image: Array, delta_hat: Array) -> Tuple[Array, Array]:
        """Warp patch-frame images by the homography implied by delta_hat
        (ref: PerceptualHead.py:237-243 / TripletHead.py:29-35)."""
        b, h, w = image.shape[0], image.shape[1], image.shape[2]
        corners = geometry.image_corners(h, w, batch_size=b,
                                         dtype=jnp.float32)
        homography = geometry.four_point_to_homography(corners, delta_hat)
        warped = geometry.warp_image(image, homography)
        return warped, homography

    @staticmethod
    def _warp_with_support(image: Array, delta_hat: Array
                           ) -> Tuple[Array, Array, Array]:
        """Like :meth:`_warp` but also returns warp(ones) — the bilinear
        support mask — in closed form instead of as an extra warp channel
        (the reference's default all-ones masks, PerceptualHead.py:334-340,
        make the warped mask analytically computable; halves the loss-warp
        bandwidth for mask-less configs)."""
        b, h, w = image.shape[0], image.shape[1], image.shape[2]
        corners = geometry.image_corners(h, w, batch_size=b,
                                         dtype=jnp.float32)
        homography = geometry.four_point_to_homography(corners, delta_hat)
        u, v = geometry.homography_grid(homography, (h, w))
        warped = geometry.batched_sample(image, u, v).reshape(image.shape)
        mask = geometry.ones_warp_mask(u, v, (h, w)).reshape(b, h, w, 1)
        return warped, mask, homography

    def _maybe_upsample(self, x: Array) -> Array:
        strategy = self.head.sampling_strategy
        if strategy == 'upsample-patch-4x':
            return _upsample_align_corners(x, 4)
        if strategy == 'upsample-patch-2x':
            return _upsample_align_corners(x, 2)
        return x

    # ------------------------------------------------------------------ #
    # Forward (training loss)
    # ------------------------------------------------------------------ #

    def __call__(self, batch: Dict[str, Array],
                 train: bool = False) -> Dict[str, Array]:
        outputs = self.backbone(batch, train=train)
        data = {**batch, **outputs}
        cfg = self.head
        if cfg.name == 'NoOpHead':
            return self._noop_forward(data)
        if cfg.name == 'PhotometricHead':
            return self._photometric_forward(data)
        if cfg.name == 'TripletHead':
            return self._triplet_head_forward(data, train)
        if cfg.name == 'PerceptualHead':
            return self._perceptual_forward(data, train)
        raise ValueError(f'Unknown head: {cfg.name}')

    # -- NoOpHead (ref: src/heads/NoOpHead.py) ------------------------- #

    def _noop_forward(self, data: Dict[str, Array]) -> Dict[str, Array]:
        cfg = self.head
        keys = cfg.learning_keys
        ground_truth = data[keys[0]]
        network_output = data[keys[1]]
        delta_gt = data[keys[2]]
        if cfg.target_gen == '4_points':
            delta_hat = data[keys[3]]
        elif cfg.target_gen == 'all_points':
            pf = data[keys[3]]                                # [B,h,w,2] NHWC
            h, w = pf.shape[1], pf.shape[2]
            delta_hat = jnp.stack([pf[:, 0, 0], pf[:, 0, w - 1],
                                   pf[:, h - 1, w - 1], pf[:, h - 1, 0]],
                                  axis=1)                     # [B,4,2]
        else:
            raise ValueError(cfg.target_gen)
        return {'ground_truth': ground_truth,
                'network_output': network_output,
                'delta_gt': delta_gt, 'delta_hat': delta_hat, 'metrics': {}}

    # -- PhotometricHead (ref: src/heads/PhotometricHead.py) ----------- #

    def _photometric_forward(self, data: Dict[str, Array]
                             ) -> Dict[str, Array]:
        cfg = self.head
        keys = cfg.learning_keys
        corners = data['corners']
        delta_hat = data[keys[3]]
        image = data[keys[1]]                                # full image_1
        homography = geometry.four_point_to_homography(corners, delta_hat)
        patch_gt = data[keys[0]]
        ps = patch_gt.shape[1]

        # warp-then-crop fused: patch(i,j) = image(H·(x0+j, y0+i))
        # (ref warps the full image then crops per sample in a Python loop,
        # PhotometricHead.py:31-41).
        u, v = geometry.homography_grid(
            homography, (ps, ps), offset=corners[:, 0].astype(jnp.float32))
        patch_hat = geometry.batched_sample(image, u, v).reshape(
            image.shape[0], ps, ps, image.shape[-1])
        return {'ground_truth': patch_gt, 'network_output': patch_hat,
                'delta_gt': data[keys[2]], 'delta_hat': delta_hat,
                'metrics': {}}

    # -- TripletHead (Zhang CA-UDHN loss; ref: src/heads/TripletHead.py) #

    def _triplet_head_forward(self, data: Dict[str, Array],
                              train: bool) -> Dict[str, Array]:
        cfg = self.head
        e1, e2 = cfg.patch_keys
        m1k, m2k = cfg.mask_keys
        f1k, f2k = cfg.feature_keys
        o1 = cfg.target_keys[0]

        patch_1, patch_2 = data[e1], data[e2]
        patch_1_m, patch_2_m = data[m1k], data[m2k]
        patch_1_f, patch_2_f = data[f1k], data[f2k]

        # FIX_MASK backbones (shipped zhang-orig) emit all-ones masks, so
        # warp(mask) is the bilinear support mask — closed form
        # (geometry.ones_warp_mask, ~5 VPU ops/point) instead of a full
        # tent warp; drops 2 of the 4 TripletHead warps exactly
        # (ref warps the mask tensor unconditionally: TripletHead.py:49-61).
        # BIHOME_TRIPLET_MASK=warp restores the generic path (parity test).
        import os
        closed_mask = (getattr(self.backbone, 'fix_mask', False)
                       and os.environ.get('BIHOME_TRIPLET_MASK',
                                          'auto') != 'warp')

        def warp_pair(patch, mask, delta):
            if closed_mask:
                return self._warp_with_support(patch, delta)
            warped, hmat = self._warp(patch, delta)
            warped_mask, _ = self._warp(mask, delta)
            return warped, warped_mask, hmat

        patch_1_prime, patch_1_m_prime, h1 = warp_pair(
            patch_1, patch_1_m, data[o1])
        patch_1_f_prime = self.backbone.extract_features(patch_1_prime,
                                                         train=train)

        doubleline = cfg.variant == 'doubleline'
        if doubleline:
            o2 = cfg.target_keys[1]
            patch_2_prime, patch_2_m_prime, h2 = warp_pair(
                patch_2, patch_2_m, data[o2])
            patch_2_f_prime = self.backbone.extract_features(patch_2_prime,
                                                             train=train)

        m2_sq = patch_2_m[..., 0]
        m1p_sq = patch_1_m_prime[..., 0]
        if doubleline and fused_loss.use_fused_loss():
            # Fused distance/mask-norm chain (ops/fused_loss.py), zhang
            # flavor: learned features on BOTH sides (plain_grad=True) and
            # no margin*C second-direction quirk (second_scale=False;
            # ref: TripletHead.py:86-100 uses the plain margin twice).
            m1_sq = patch_1_m[..., 0]
            m2p_sq = patch_2_m_prime[..., 0]
            ln1, ln2, fm = fused_loss.triplet_double_line(
                jnp.concatenate([patch_1_f_prime, patch_2_f_prime], axis=0),
                jnp.concatenate([patch_1_f, patch_2_f], axis=0),
                m1p_sq * m2_sq, m2p_sq * m1_sq,
                cfg.triplet_margin, cfg.triplet_aggregation,
                False, True)
            (mean_l1, mean_l2, mean_l3,
             mean_f1, mean_f2, mean_f1p, _, _) = fm
            ln3 = jnp.sum((jnp.matmul(h1, h2) - jnp.eye(3)) ** 2)
            loss = ln1 + ln2 + cfg.mu * ln3
            return {'loss': loss, 'delta_gt': data.get('delta'),
                    'delta_hat': data[o1], 'metrics': {
                        'loss_comp/l1': mean_l1, 'loss_comp/l2': mean_l2,
                        'loss_comp/l3': mean_l3,
                        'loss_comp/ln1': ln1, 'loss_comp/ln2': ln2,
                        'loss_comp/ln3': cfg.mu * ln3,
                        'h/h1': jnp.sum((h1 - jnp.eye(3)) ** 2),
                        'h/h2': jnp.sum((h2 - jnp.eye(3)) ** 2),
                        'feature_space/patch_2_f': mean_f2,
                        'feature_space/patch_1_f_prime': mean_f1p,
                        'feature_space/patch_1_f': mean_f1}}

        l1 = jnp.abs(patch_1_f_prime - patch_2_f)
        l3 = jnp.abs(patch_1_f - patch_2_f)
        loss_mat_1 = self._triplet_margin_aggregate(l1, l3,
                                                    cfg.triplet_margin,
                                                    cfg.triplet_aggregation,
                                                    second_elem=False)
        ln1_den = jnp.sum(m1p_sq * m2_sq, axis=(-2, -1))
        ln1 = jnp.sum(m1p_sq * m2_sq * loss_mat_1, axis=(-2, -1)) / \
            jnp.maximum(ln1_den, 1.0)
        ln1 = jnp.sum(ln1)
        loss = ln1
        metrics = {
            'loss_comp/l1': jnp.mean(jnp.abs(patch_2_f - patch_1_f_prime)),
            'loss_comp/l3': jnp.mean(jnp.abs(patch_1_f - patch_2_f)),
            'h/h1': jnp.sum((h1 - jnp.eye(3)) ** 2),
            'feature_space/patch_2_f': jnp.mean(patch_2_f),
            'feature_space/patch_1_f_prime': jnp.mean(patch_1_f_prime),
            'feature_space/patch_1_f': jnp.mean(patch_1_f),
        }
        if doubleline:
            l2 = jnp.abs(patch_2_f_prime - patch_1_f)
            loss_mat_2 = self._triplet_margin_aggregate(
                l2, l3, cfg.triplet_margin, cfg.triplet_aggregation,
                second_elem=False)
            m1_sq = patch_1_m[..., 0]
            m2p_sq = patch_2_m_prime[..., 0]
            ln2_den = jnp.sum(m2p_sq * m1_sq, axis=(-2, -1))
            ln2 = jnp.sum(m2p_sq * m1_sq * loss_mat_2, axis=(-2, -1)) / \
                jnp.maximum(ln2_den, 1.0)
            ln2 = jnp.sum(ln2)
            ln3 = jnp.sum((jnp.matmul(h1, h2) - jnp.eye(3)) ** 2)
            loss = ln1 + ln2 + cfg.mu * ln3
            metrics.update({
                'loss_comp/l2': jnp.mean(jnp.abs(patch_1_f - patch_2_f_prime)),
                'loss_comp/ln1': ln1, 'loss_comp/ln2': ln2,
                'loss_comp/ln3': cfg.mu * ln3,
                'h/h2': jnp.sum((h2 - jnp.eye(3)) ** 2),
            })
        delta_gt = data.get('delta')
        return {'loss': loss, 'delta_gt': delta_gt, 'delta_hat': data[o1],
                'metrics': metrics}

    # -- PerceptualHead (biHomE; ref: src/heads/PerceptualHead.py) ------ #

    def _perceptual_forward(self, data: Dict[str, Array],
                            train: bool) -> Dict[str, Array]:
        cfg = self.head
        doubleline = 'double-line' in cfg.triplet_loss
        scores = None

        if cfg.delta_hat_keys:
            delta_hats_12 = data[cfg.delta_hat_keys[0]]       # [B,4,2]
            n = 1
            delta_hats_21 = (data[cfg.delta_hat_keys[1]]
                             if doubleline else None)
        else:
            n = cfg.hypothesis_no
            delta_hats_12, scores = self._dsac_deltas(data[cfg.pf_keys[0]])
            if doubleline:
                delta_hats_21, _ = self._dsac_deltas(data[cfg.pf_keys[1]])
            else:
                delta_hats_21 = None

        if cfg.triplet_loss == '':
            return self._multihead_loss(data, delta_hats_12, scores, n)
        return self._triplet_resnet_loss(data, delta_hats_12, delta_hats_21,
                                         scores, n, train)

    def _dsac_deltas(self, pf: Array) -> Tuple[Array, Array]:
        """PF -> DSAC hypotheses -> corner deltas
        (ref: PerceptualHead.py:125-205). pf: [B,h,w,2] NHWC."""
        cfg = self.head
        b, h, w, _ = pf.shape
        key = self.make_rng('dsac')
        if cfg.hypothesis_no == 1 and cfg.scoring_method != 'score_cnn':
            # softmax(-s) over a single hypothesis is identically [1.0]
            # with zero gradient into s, so scoring all H*W points
            # (ref: ransac_utils.py:77-126) is pure dead compute — skip it.
            # Exact, not a divergence; saves ~3 ms/step on zeng-bihome.
            # (score_cnn mode still runs so its params exist for ports.)
            # Without scoring, only the sampled points are ever read, so
            # the full [B,H*W,2] mapping tensor is skipped too
            # (dsac.sample_hypotheses_from_pf — same values, same PRNG).
            hyps = dsac_lib.sample_hypotheses_from_pf(
                pf, key, cfg.hypothesis_no, cfg.points_per_hypothesis,
                cfg.dsac_point_sampling)                         # [B,n,3,3]
            scores = jnp.ones((b, 1), pf.dtype)
        else:
            ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing='ij')
            coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # [N,2]
            coords = jnp.broadcast_to(coords[None], (b, h * w, 2))
            mapping = coords + pf.reshape(b, -1, 2)
            hyps = dsac_lib.sample_hypotheses(
                coords, mapping, key, cfg.hypothesis_no,
                cfg.points_per_hypothesis, cfg.dsac_point_sampling)
            score_fn = None
            if cfg.scoring_method == 'score_cnn':
                def score_fn(img):
                    return self.score_cnn(img, train=False)
            scores, _ = dsac_lib.score_hypotheses(
                coords, mapping, hyps, cfg.scoring_method,
                cfg.scoring_distance_threshold, cfg.scoring_distance_beta,
                score_fn)                                      # [B,n]
        four_points = jnp.array([[0, 0], [w, 0], [w, h], [0, h]], jnp.float32)
        fp = jnp.broadcast_to(four_points[None],
                              (b * cfg.hypothesis_no, 4, 2))
        transformed = geometry.transform_points(hyps.reshape(-1, 3, 3), fp)
        delta_hats = (transformed - fp).reshape(b, cfg.hypothesis_no, 4, 2)
        return delta_hats, scores

    def _multihead_loss(self, data, delta_hats, scores, n):
        """TRIPLET_LOSS='' variant: return feature pair for external
        MSE/cosine loss (ref: PerceptualHead.py:245-315)."""
        cfg = self.head
        e1, e2 = cfg.patch_keys
        b = data[e1].shape[0]
        p1 = jnp.repeat(data[e1], n, axis=0)
        p2 = jnp.repeat(data[e2], n, axis=0)
        delta_flat = delta_hats.reshape(b * n, 4, 2)
        p1_warped, h1 = self._warp(p1, delta_flat)
        stacked = jnp.concatenate([p2, p1_warped], axis=0)
        feats = self._aux_features(stacked, train=False)
        patch_2_f, patch_1_f_prime = jnp.split(feats, 2, axis=0)
        if scores is not None:
            s = scores.reshape(b * n, 1, 1, 1)
            patch_1_f_prime = patch_1_f_prime * s
            patch_2_f = patch_2_f * s
        metrics = {
            'feature_space/patch_2_f': jnp.mean(patch_2_f),
            'feature_space/patch_1_f_prime': jnp.mean(patch_1_f_prime),
            'loss_comp/l1': jnp.mean(jnp.abs(patch_2_f - patch_1_f_prime)),
            'h/h1': jnp.sum((h1 - jnp.eye(3)) ** 2),
        }
        delta_hat = self._score_weighted_delta(delta_hats, scores, b, n)
        return {'ground_truth': patch_2_f, 'network_output': patch_1_f_prime,
                'delta_gt': data.get('delta'), 'delta_hat': delta_hat,
                'metrics': metrics}

    @staticmethod
    def _score_weighted_delta(delta_hats, scores, b, n):
        if scores is not None:
            weighted = delta_hats.reshape(b, n, 4, 2) * scores.reshape(
                b, n, 1, 1)
            return jnp.sum(weighted, axis=1)
        return delta_hats.reshape(b, 4, 2) if n == 1 else delta_hats

    def _triplet_distances(self, fa: Array, fb: Array) -> Array:
        """Per-pixel distance between feature maps; channel-resolved for
        'l1', channel-reduced for 'l2'/'cosine'
        (ref: PerceptualHead.py:543-606)."""
        dist = self.head.triplet_distance
        if dist == 'l1':
            return jnp.abs(fa - fb)                           # [.,h,w,C]
        if dist == 'l2':
            return jnp.mean(jnp.square(fa - fb), axis=-1)     # [.,h,w]
        if dist == 'cosine':
            num = jnp.sum(fa * fb, axis=-1)
            den = jnp.maximum(jnp.linalg.norm(fa, axis=-1)
                              * jnp.linalg.norm(fb, axis=-1), 1e-8)
            return 1.0 - num / den                            # [.,h,w]
        raise ValueError(dist)

    def _triplet_margin_aggregate(self, l_pos: Array, l_anchor: Array,
                                  margin, aggregation: str,
                                  second_elem: bool) -> Array:
        """Channel aggregation + optional hinge (ref: PerceptualHead.py:
        614-651, TripletHead.py:86-100). 'inf' margin string -> no hinge.

        With a float margin and channel-agnostic aggregation, the reference
        scales the margin by the channel count for the SECOND loss element
        only (hardcoded 64 at PerceptualHead.py:648); replicated via
        ``second_elem``. Channel-reduced distances (l2/cosine) are already
        [.,h,w] and aggregate trivially.
        """
        channel_resolved = l_pos.ndim == 4
        if isinstance(margin, str):                           # 'inf': no hinge
            if not channel_resolved:
                return l_pos - l_anchor
            if aggregation == 'channel-aware':
                return jnp.sum(l_pos - l_anchor, axis=-1)
            if aggregation == 'channel-agnostic':
                return jnp.sum(l_pos, axis=-1) - jnp.sum(l_anchor, axis=-1)
            raise ValueError(aggregation)
        if not channel_resolved:
            return jnp.maximum(l_pos - l_anchor + margin, 0.0)
        if aggregation == 'channel-aware':
            return jnp.sum(jnp.maximum(l_pos - l_anchor + margin, 0.0),
                           axis=-1)
        if aggregation == 'channel-agnostic':
            eff_margin = margin * l_pos.shape[-1] if second_elem else margin
            return jnp.maximum(jnp.sum(l_pos, axis=-1)
                               - jnp.sum(l_anchor, axis=-1) + eff_margin, 0.0)
        raise ValueError(aggregation)

    def _triplet_resnet_loss(self, data, delta_hats_12, delta_hats_21,
                             scores, n, train):
        """The biHomE loss (ref: PerceptualHead.py:320-714)."""
        cfg = self.head
        e1, e2 = cfg.patch_keys
        b = data[e1].shape[0]
        i = cfg.patch_size
        doubleline = 'double-line' in cfg.triplet_loss

        patch_1 = jnp.repeat(data[e1], n, axis=0)             # [B*n,i,i,1]
        patch_2 = jnp.repeat(data[e2], n, axis=0)
        if cfg.mask_keys:
            patch_1_m = jnp.repeat(data[cfg.mask_keys[0]], n, axis=0)
            patch_2_m = jnp.repeat(data[cfg.mask_keys[1]], n, axis=0)
        else:
            patch_1_m = jnp.ones_like(patch_1)
            patch_2_m = jnp.ones_like(patch_2)

        # One fused warp: mask rides as a second channel (same homography,
        # same tent weights), and both directions stack on the batch axis —
        # 4 warp kernels (ref does 4 sequential _warp calls,
        # PerceptualHead.py:371-401) become 1. In bf16 compute mode the warp
        # inputs are cast to bf16 too (the warped patches only feed the bf16
        # extractor; halves the dominant tent-contraction bandwidth).
        delta_12 = delta_hats_12.reshape(b * n, 4, 2)
        patch_1 = patch_1.astype(self.dtype)
        patch_2 = patch_2.astype(self.dtype)
        patch_1_m = patch_1_m.astype(self.dtype)
        patch_2_m = patch_2_m.astype(self.dtype)
        if not cfg.mask_keys:
            # Mask-less configs (all shipped *-bihome configs): the warped
            # mask is warp(ones) — computed in closed form, so only the
            # patch channel is sampled.
            if doubleline:
                delta_21 = delta_hats_21.reshape(b * n, 4, 2)
                warped, wmask, h12 = self._warp_with_support(
                    jnp.concatenate([patch_1, patch_2], axis=0),
                    jnp.concatenate([delta_12, delta_21], axis=0))
                wmask = wmask.astype(self.dtype)
                h1, h2 = h12[:b * n], h12[b * n:]
                patch_1_prime = warped[:b * n]
                patch_1_m_prime = wmask[:b * n]
                patch_2_prime = warped[b * n:]
                patch_2_m_prime = wmask[b * n:]
            else:
                warped, wmask, h1 = self._warp_with_support(patch_1,
                                                            delta_12)
                patch_1_prime = warped
                patch_1_m_prime = wmask.astype(self.dtype)
        elif doubleline:
            pm1 = jnp.concatenate([patch_1, patch_1_m], axis=-1)
            delta_21 = delta_hats_21.reshape(b * n, 4, 2)
            pm2 = jnp.concatenate([patch_2, patch_2_m], axis=-1)
            warped, h12 = self._warp(jnp.concatenate([pm1, pm2], axis=0),
                                     jnp.concatenate([delta_12, delta_21],
                                                     axis=0))
            h1, h2 = h12[:b * n], h12[b * n:]
            patch_1_prime = warped[:b * n, ..., :1]
            patch_1_m_prime = warped[:b * n, ..., 1:]
            patch_2_prime = warped[b * n:, ..., :1]
            patch_2_m_prime = warped[b * n:, ..., 1:]
        else:
            pm1 = jnp.concatenate([patch_1, patch_1_m], axis=-1)
            warped, h1 = self._warp(pm1, delta_12)
            patch_1_prime = warped[..., :1]
            patch_1_m_prime = warped[..., 1:]

        # ---- Stacked frozen-extractor passes (TPU win: ref does 4
        # sequential passes, PerceptualHead.py:352-398). Two stacked passes,
        # split by differentiability: patch_1/patch_2 are DATA (no gradient
        # path — deltas only enter through the warps), so their pass runs
        # under stop_gradient and XLA emits no backward for it; only the
        # warped half pays input-grad convs. Same math, ~half the extractor
        # backward.
        plain = jnp.concatenate([self._maybe_upsample(patch_1),
                                 self._maybe_upsample(patch_2)], axis=0)
        # Output stop_gradient too: the plain patches are data (no delta
        # path), so the only cotangents this pass could produce are the
        # frozen-extractor PARAM grads, which the trainer structurally
        # discards (trainer.py loss_fn stop-gradients auxiliary_resnet,
        # ref: PerceptualHead.py:35-39 requires_grad=False). Killing them
        # here keeps apply-level autodiff consistent with the fused loss
        # path and skips the dead weight-grad convs outside the trainer.
        feats_plain = jax.lax.stop_gradient(
            self._aux_features(jax.lax.stop_gradient(plain), train=train))
        patch_1_f, patch_2_f = jnp.split(feats_plain, 2, axis=0)
        if doubleline:
            warped_in = jnp.concatenate(
                [self._maybe_upsample(patch_1_prime),
                 self._maybe_upsample(patch_2_prime)], axis=0)
            feats_w = self._aux_features(warped_in, train=train)
            patch_1_f_prime, patch_2_f_prime = jnp.split(feats_w, 2, axis=0)
        else:
            patch_1_f_prime = self._aux_features(
                self._maybe_upsample(patch_1_prime), train=train)
            patch_2_f_prime = None

        f_h = patch_1_f_prime.shape[1]
        # Mask downsampling to feature resolution (always on, mirroring the
        # `or True` in ref: PerceptualHead.py:448).
        factor = patch_1_m.shape[1] // f_h
        patch_1_m_prime_d = _avg_pool(patch_1_m_prime, factor)
        patch_2_m_d = _avg_pool(patch_2_m, factor)
        if doubleline:
            patch_1_m_d = _avg_pool(patch_1_m, factor)
            patch_2_m_prime_d = _avg_pool(patch_2_m_prime, factor)

        metrics: Dict[str, Array] = {}

        if 'dual' in cfg.triplet_loss:
            loss_dual = self._dual_loss(patch_1, patch_2, patch_1_prime,
                                        patch_2_prime if doubleline else None,
                                        patch_1_m, patch_2_m,
                                        patch_1_m_prime,
                                        patch_2_m_prime if doubleline
                                        else None, doubleline, train)
        else:
            loss_dual = None

        if 'one-line' in cfg.triplet_loss:
            fa, fb, fc = patch_1_f_prime, patch_2_f, patch_1_f
            if cfg.with_projection_head:
                def normalize(f):
                    return f / jnp.maximum(
                        jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
                fa, fb, fc = normalize(fa), normalize(fb), normalize(fc)
            if cfg.triplet_distance == 'l1':
                l1 = jnp.sum(jnp.abs(fa - fb), axis=-1)        # [B*n,h,w]
                l3 = jnp.sum(jnp.abs(fc - fb), axis=-1)
            elif cfg.triplet_distance == 'cosine':
                l1 = self._triplet_distances(fa, fb)
                l3 = self._triplet_distances(fc, fb)
            else:
                raise ValueError(cfg.triplet_distance)
            margin = (cfg.triplet_margin
                      if not isinstance(cfg.triplet_margin, str) else 0.0)
            loss_mat = jnp.maximum(l1 - l3 + margin, 0.0)
            if scores is not None:
                loss_mat = loss_mat * scores.reshape(b * n, 1, 1)
            m2_sq = patch_2_m_d[..., 0]
            m1p_sq = patch_1_m_prime_d[..., 0]
            if not cfg.mask_crd:
                den = jnp.sum(m1p_sq * m2_sq, axis=(-2, -1))
                loss_vec = jnp.sum(m1p_sq * m2_sq * loss_mat,
                                   axis=(-2, -1)) / jnp.maximum(den, 1.0)
            else:
                den = jnp.sum(m1p_sq, axis=(-2, -1))
                loss_vec = jnp.sum(m1p_sq * loss_mat,
                                   axis=(-2, -1)) / jnp.maximum(den, 1.0)
            loss = jnp.sum(loss_vec)

        elif doubleline and (cfg.triplet_distance == 'l1'
                             and fused_loss.use_fused_loss()):
            # Fused distance/mask-norm chain (ops/fused_loss.py): one
            # custom-vjp op replaces the ~20-kernel open-coded tail —
            # launch-floor relief on a runtime with a ~45us/op floor.
            # Exact same math; parity pinned by tests/test_fused_loss.py.
            m1p_sq = patch_1_m_prime_d[..., 0]
            m2_sq = patch_2_m_d[..., 0]
            m2p_sq = patch_2_m_prime_d[..., 0]
            m1_sq = patch_1_m_d[..., 0]
            ln1, ln2, fm = fused_loss.triplet_double_line(
                jnp.concatenate([patch_1_f_prime, patch_2_f_prime], axis=0),
                jnp.concatenate([patch_1_f, patch_2_f], axis=0),
                m1p_sq * m2_sq, m2p_sq * m1_sq,
                cfg.triplet_margin, cfg.triplet_aggregation,
                True,      # second_scale: the reference's margin*C quirk
                False)     # plain features are stop_gradient'd above
            ln3 = jnp.sum((jnp.matmul(h1, h2) - jnp.eye(3)) ** 2)
            loss = ln1 + ln2 + cfg.triplet_mu * ln3
            (mean_l1, mean_l2, mean_l3,
             mean_f1, mean_f2, mean_f1p, min_den1, min_den2) = fm
            metrics.update({'loss_comp/ln1': ln1, 'loss_comp/ln2': ln2,
                            'loss_comp/ln3': cfg.triplet_mu * ln3,
                            'loss_den/l1_den': min_den1,
                            'loss_den/l2_den': min_den2,
                            'loss_comp/l2': mean_l2,
                            'h/h2': jnp.sum((h2 - jnp.eye(3)) ** 2),
                            # The shared-metrics block below recomputes
                            # these as separate full-map reduces; the
                            # fused op already produced them — override
                            # (same values) so XLA DCEs the extra passes.
                            'feature_space/patch_1_f': mean_f1,
                            'feature_space/patch_2_f': mean_f2,
                            'feature_space/patch_1_f_prime': mean_f1p,
                            'loss_comp/l1': mean_l1,
                            'loss_comp/l3': mean_l3})

        elif doubleline:
            l1 = self._triplet_distances(patch_1_f_prime, patch_2_f)
            l2 = self._triplet_distances(patch_2_f_prime, patch_1_f)
            l3 = self._triplet_distances(patch_1_f, patch_2_f)

            m1p_sq = patch_1_m_prime_d[..., 0]
            m2_sq = patch_2_m_d[..., 0]
            ln1_den = jnp.sum(m1p_sq * m2_sq, axis=(-2, -1))
            loss_mat_1 = self._triplet_margin_aggregate(
                l1, l3, cfg.triplet_margin, cfg.triplet_aggregation,
                second_elem=False)
            ln1 = jnp.sum(m1p_sq * m2_sq * loss_mat_1, axis=(-2, -1)) / \
                jnp.maximum(ln1_den, 1.0)

            m2p_sq = patch_2_m_prime_d[..., 0]
            m1_sq = patch_1_m_d[..., 0]
            ln2_den = jnp.sum(m2p_sq * m1_sq, axis=(-2, -1))
            loss_mat_2 = self._triplet_margin_aggregate(
                l2, l3, cfg.triplet_margin, cfg.triplet_aggregation,
                second_elem=True)
            ln2 = jnp.sum(m2p_sq * m1_sq * loss_mat_2, axis=(-2, -1)) / \
                jnp.maximum(ln2_den, 1.0)

            ln1 = jnp.sum(ln1)
            ln2 = jnp.sum(ln2)
            ln3 = jnp.sum((jnp.matmul(h1, h2) - jnp.eye(3)) ** 2)
            loss = ln1 + ln2 + cfg.triplet_mu * ln3
            metrics.update({'loss_comp/ln1': ln1, 'loss_comp/ln2': ln2,
                            'loss_comp/ln3': cfg.triplet_mu * ln3,
                            'loss_den/l1_den': jnp.min(ln1_den),
                            'loss_den/l2_den': jnp.min(ln2_den),
                            'loss_comp/l2': jnp.mean(jnp.abs(
                                patch_1_f - patch_2_f_prime)),
                            'h/h2': jnp.sum((h2 - jnp.eye(3)) ** 2)})
        else:
            raise ValueError(f'Unknown TRIPLET_LOSS: {cfg.triplet_loss}')

        if loss_dual is not None:
            loss = loss + loss_dual

        # setdefault: the fused-loss branch already produced these scalars
        # inside its single traversal — recomputing them here would emit
        # five extra full-map reduce kernels.
        for key, fn in (
            ('feature_space/patch_1_f', lambda: jnp.mean(patch_1_f)),
            ('feature_space/patch_2_f', lambda: jnp.mean(patch_2_f)),
            ('feature_space/patch_1_f_prime',
             lambda: jnp.mean(patch_1_f_prime)),
            ('loss_comp/l1',
             lambda: jnp.mean(jnp.abs(patch_2_f - patch_1_f_prime))),
            ('loss_comp/l3',
             lambda: jnp.mean(jnp.abs(patch_2_f - patch_1_f))),
            ('h/h1', lambda: jnp.sum((h1 - jnp.eye(3)) ** 2)),
        ):
            if key not in metrics:
                metrics[key] = fn()
        delta_hat = self._score_weighted_delta(delta_hats_12, scores, b, n)
        return {'loss': loss, 'delta_gt': data.get('delta'),
                'delta_hat': delta_hat, 'metrics': metrics}

    def _dual_loss(self, patch_1, patch_2, patch_1_prime, patch_2_prime,
                   patch_1_m, patch_2_m, patch_1_m_prime, patch_2_m_prime,
                   doubleline, train):
        """'dual' variant: adds the backbone's own feature-space loss
        (ref: PerceptualHead.py:407-441). Requires a ContentAware backbone."""
        ext = self.backbone.extract_features
        f1 = ext(patch_1, train=train)
        f2 = ext(patch_2, train=train)
        f1p = ext(patch_1_prime, train=train)
        l1 = jnp.sum(jnp.abs(f1p - f2), axis=-1)
        l3 = jnp.sum(jnp.abs(f1 - f2), axis=-1)
        m1p = patch_1_m_prime[..., 0]
        m2 = patch_2_m[..., 0]
        den1 = jnp.sum(m1p * m2, axis=(-2, -1))
        ln1 = jnp.sum(m1p * m2 * (l1 - l3), axis=(-2, -1)) / \
            jnp.maximum(den1, 1.0)
        loss = jnp.sum(ln1)
        if doubleline:
            f2p = ext(patch_2_prime, train=train)
            l2 = jnp.sum(jnp.abs(f2p - f1), axis=-1)
            m2p = patch_2_m_prime[..., 0]
            m1 = patch_1_m[..., 0]
            den2 = jnp.sum(m2p * m1, axis=(-2, -1))
            ln2 = jnp.sum(m2p * m1 * (l2 - l3), axis=(-2, -1)) / \
                jnp.maximum(den2, 1.0)
            loss = loss + jnp.sum(ln2)
        return loss

    # ------------------------------------------------------------------ #
    # Prediction (eval path; ref ModelWrapper.predict_homography chain)
    # ------------------------------------------------------------------ #

    def predict(self, batch: Dict[str, Array]
                ) -> Tuple[Array, Optional[Array]]:
        outputs = self.backbone(batch, train=False)
        data = {**batch, **outputs}
        cfg = self.head

        if cfg.name == 'NoOpHead':
            if cfg.target_gen == '4_points':
                delta_hat = data[cfg.learning_keys[3]]
                homography = geometry.four_point_to_homography(
                    data['corners'], delta_hat)
                return delta_hat, homography
            pf = data[cfg.learning_keys[1]]
            key = self.make_rng('ransac')
            return ransac_lib.perspective_field_to_delta(pf, key)

        if cfg.name == 'PhotometricHead':
            delta_hat = data[cfg.learning_keys[3]]
            homography = geometry.four_point_to_homography(
                data['corners'], delta_hat)
            return delta_hat, homography

        if cfg.name == 'TripletHead':
            delta_hat = data[cfg.target_keys[0]]
            _, homography = self._warp(data[cfg.patch_keys[0]], delta_hat)
            return delta_hat, homography

        if cfg.name == 'PerceptualHead':
            if cfg.delta_hat_keys:
                return data[cfg.delta_hat_keys[0]], None

            def fit_delta(pf):
                delta_hats, scores = self._dsac_deltas(pf)
                best = jnp.argmax(scores, axis=-1)            # [B]
                delta = jnp.take_along_axis(
                    delta_hats, best[:, None, None, None], axis=1)[:, 0]
                if cfg.dsac_predict_refine:
                    thr = (cfg.dsac_predict_refine_threshold
                           if cfg.dsac_predict_refine_threshold > 0
                           else cfg.scoring_distance_threshold)
                    delta = dsac_lib.refine_delta_on_pf(
                        pf, delta, thr, cfg.dsac_predict_refine_iters)
                return delta

            delta_hat = fit_delta(data[cfg.pf_keys[0]])
            if cfg.dsac_predict_bidirectional and len(cfg.pf_keys) > 1:
                # DoubleLine predicts both fields; the 2->1 field carries an
                # independent estimate of the SAME homography (H12 = H21^-1).
                # Fit it, invert through the corner parametrization, and
                # average the deltas — cancels independent fit noise
                # (predict-only extension knob; training untouched).
                pf21 = data[cfg.pf_keys[1]]
                h, w = pf21.shape[1:3]
                fp = jnp.broadcast_to(
                    jnp.array([[0, 0], [w, 0], [w, h], [0, h]],
                              jnp.float32)[None],
                    (pf21.shape[0], 4, 2))
                delta21 = fit_delta(pf21)
                h21 = geometry.four_point_to_homography(
                    fp, delta21.astype(jnp.float32))
                delta12p = geometry.transform_points(
                    geometry.inv3x3(h21), fp) - fp
                delta_hat = 0.5 * (delta_hat
                                   + delta12p.astype(delta_hat.dtype))
            return delta_hat, None

        raise ValueError(cfg.name)
