#!/usr/bin/env python3
"""Self-supervised pretext training for the biHomE auxiliary extractor.

The biHomE loss is defined in the feature space of a FROZEN pretrained
resnet34 (ref: src/heads/PerceptualHead.py:21-39); the reference downloads
ImageNet weights. This environment has no network and no .pth files, so
this tool trains the conv1/bn1/layer1 stack (all biHomE uses at
AUXILIARY_RESNET_OUTPUT_LAYER=1; ``--layers 2`` extends the trained stack
through layer2 for use with AUXILIARY_RESNET_OUTPUT_LAYER=2 — stride-8,
128-ch features) on a pretext over the synthetic pool and saves the
subtree as an .npz that train.py's HEAD.AUXILIARY_RESNET_PATH accepts.
Two pretexts:

  rotnet (default): rotation prediction (RotNet, Gidaris et al. 2018).
  grad: regress a multi-scale blurred intensity+gradient pyramid — the
        alignment-friendly space used by the flagship training demo
        (coarse channels carry long-range alignment gradients; see
        BENCH_NOTES.md "training-quality demonstration").

  gradpi: photometric-invariant variant of grad (gradient-only pyramid,
        contrast-normalized) with brightness/contrast input jitter.
  gradpds: gradpi targets from the CLEAN grayscale patch with the input
        run through the FULL PDS PhotometricDistortSimple chain on RGB —
        directly optimizes invariance to the PDS-COCO nuisance
        (requires the natural-statistics pool, data/synthetic.py).
  gradcl: grad distillation PLUS a dense-correspondence InfoNCE term:
        patch_2 is warped by the GROUND-TRUTH delta (exactly the head's
        loss-warp at convergence, heads/assembled.py:_warp_with_support)
        and each feature-grid position of F(patch_1) must match the
        corresponding position of F(warp_gt(patch_2)) against all other
        positions. This trains the full 64-dim feature space as an
        alignment metric — the distill-only targets have intrinsic rank
        ~12, which set the round-2 flagship MACE floor (BENCH_NOTES.md).
  gradpdscl: gradcl with the full PDS photometric chain applied
        independently to both views (photometric invariance and
        geometric correspondence learned jointly); distill term uses the
        PI targets at reduced weight.

Optional extra terms on the cl pretexts: --cl_fine_weight (rex=0
InfoNCE — immediate neighbors as negatives) and --basin_weight (the
feature distance to the aligned view must increase under a 0.5-4px
corner-jittered warp; shapes the sub-4px basin slope that grid-level
InfoNCE cannot see).

    python tools/pretrain_aux.py --pretext grad --steps 2500 --out aux.npz
"""

import argparse
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bihome_tpu import geometry
from bihome_tpu.data import photometric, pipeline, synthetic
from bihome_tpu.models.resnet import ResNet
from bihome_tpu.ops import color
from bihome_tpu.utils import aux_store


def _conv3_edge(x, k):
    """3x3 conv with edge-replicate padding: a CONSTANT input yields
    sum(k)*input everywhere (no zero-pad border leakage — with zero
    padding a brightness offset would bleed gradients in from the
    borders and the photometric invariance of gradpi would be lost)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), 'VALID', feature_group_count=x.shape[-1],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _sobel(x, k):
    return _conv3_edge(
        x, jnp.tile(k[:, :, None, None], (1, 1, 1, x.shape[-1])))


def _blur(x, times):
    """Repeated 3x3 binomial blur (approx Gaussian, sigma ~ sqrt(times/2))."""
    k = jnp.array([[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]],
                  jnp.float32) / 16.0
    kc = jnp.tile(k[:, :, None, None], (1, 1, 1, x.shape[-1]))
    for _ in range(times):
        x = _conv3_edge(x, kc)
    return x


def grad_targets(x, rich=False, stride=4, out_dim=64):
    """Alignment-friendly distillation target: a multi-scale pyramid at
    H/``stride`` — intensity and Sobel gradients at blur scales
    sigma ~ {0, 2, 4, 8}px — projected to ``out_dim`` dims by a FIXED
    random map + tanh. (stride=4/out_dim=64 matches layer1 features;
    stride=8/out_dim=128 matches layer2 — the --layers knob.)

    The coarse blurred channels have long correlation lengths, so the
    feature distance has a non-zero gradient toward alignment even from
    rho=32px perturbations (classic coarse-to-fine registration); the fine
    gradient channels sharpen the optimum. This is the property the paper
    gets from ImageNet layer1 features (ref: PerceptualHead.py:21-39) and
    what a rotation-pretext or raw-gradient space lacks.

    ``rich=True`` doubles the per-scale channel set (diagonal derivatives
    + Laplacian) to raise the target's intrinsic rank ~12 -> ~24: the
    distill-only extractor's MACE floor tracked the target rank
    (BENCH_NOTES.md, contrastive-extractor section), so a fuller basis
    gives the InfoNCE terms more directions to shape."""
    kx = jnp.array([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]],
                   jnp.float32) / 4.0
    x = x.astype(jnp.float32)
    base = nnavg_pool(x, stride)                           # [B,H/s,W/s,1]
    kd = jnp.array([[2., 1., 0.], [1., 0., -1.], [0., -1., -2.]],
                   jnp.float32) / 4.0                      # 45deg derivative
    kl = jnp.array([[0., 1., 0.], [1., -4., 1.], [0., 1., 0.]],
                   jnp.float32) / 4.0                      # Laplacian
    chans = []
    for times in (0, 2, 8, 32):                            # sigma ~ 0,1,2,4
        b = _blur(base, times) if times else base
        chans += [b, _sobel(b, kx), _sobel(b, kx.T)]
        if rich:
            chans += [_sobel(b, kd), _sobel(b, kd.T), _sobel(b, kl)]
    t = jnp.concatenate(chans, axis=-1)                    # [B,*,*,12|24]
    proj = jax.random.normal(
        jax.random.PRNGKey(42),
        (t.shape[-1], out_dim)) / jnp.sqrt(float(t.shape[-1]))
    return jnp.tanh(t @ proj)


def nnavg_pool(x, s):
    b, h, w, c = x.shape
    return x.reshape(b, h // s, s, w // s, s, c).mean(axis=(2, 4))


def grad_targets_pi(x, stride=4, out_dim=64):
    """Photometrically invariant variant of grad_targets for PDS-style
    training: gradient-only pyramid (intensity channels dropped — kills
    brightness offsets) normalized by the per-sample mean |g| (kills
    contrast scaling), then the fixed projection + tanh."""
    kx = jnp.array([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]],
                   jnp.float32) / 4.0
    x = x.astype(jnp.float32)
    base = nnavg_pool(x, stride)
    chans = []
    for times in (0, 2, 8, 32):
        b = _blur(base, times) if times else base
        chans += [_sobel(b, kx), _sobel(b, kx.T)]
    t = jnp.concatenate(chans, axis=-1)                    # [B,*,*,8]
    scale = jnp.mean(jnp.abs(t), axis=(1, 2, 3), keepdims=True) + 1e-3
    t = t / scale
    proj = jax.random.normal(
        jax.random.PRNGKey(43),
        (t.shape[-1], out_dim)) / jnp.sqrt(float(t.shape[-1]))
    return jnp.tanh(t @ proj)


def dense_infonce(f1, f2, valid, tau=0.15, rex=2, hard_beta=0.0):
    """Dense-correspondence InfoNCE between two ALIGNED feature maps.

    f1, f2: [B,Hf,Wf,C] — f2 comes from the gt-warped second patch, so
    position (i,j) in f2 shows the same scene content as (i,j) in f1.
    valid: [B,Hf,Wf] in [0,1] — warp-support weight per position.

    Per sample, cosine-similarity logits between all Hf*Wf positions of f1
    (anchors) and f2 (candidates); the positive is the same position, and
    spatial neighbors within Chebyshev radius ``rex`` are excluded from
    the negatives (their receptive fields overlap the positive's — pushing
    them apart would force high-frequency features and a narrow basin).
    Positions without full warp support are dropped as anchors and masked
    out as candidates. Symmetrized over the two directions.

    ``hard_beta`` > 0 importance-reweights the negatives by their hardness
    (Robinson et al. 2021, "Contrastive Learning with Hard Negative
    Samples"): each negative's contribution to the partition function is
    scaled by softmax(beta * s) over the negatives, keeping the effective
    negative count constant — in log space the negative term becomes
    log(N) + lse((1+beta)s) - lse(beta*s). beta=0 reduces exactly to the
    uniform objective. Hard negatives here are look-alike positions
    (repeated texture, aperture-problem edges) — exactly the confusions
    that cost alignment accuracy downstream.

    Returns (loss, acc): mean -log p(positive), and the fraction of valid
    anchors whose argmax candidate is the true position.
    """
    b, hf, wf, c = f1.shape
    p = hf * wf
    n1 = f1.reshape(b, p, c).astype(jnp.float32)
    n2 = f2.reshape(b, p, c).astype(jnp.float32)
    n1 = n1 / (jnp.linalg.norm(n1, axis=-1, keepdims=True) + 1e-6)
    n2 = n2 / (jnp.linalg.norm(n2, axis=-1, keepdims=True) + 1e-6)
    sim = jnp.einsum('bpc,bqc->bpq', n1, n2,
                     preferred_element_type=jnp.float32) / tau   # [B,P,P]

    ii, jj = jnp.meshgrid(jnp.arange(hf), jnp.arange(wf), indexing='ij')
    pos = jnp.stack([ii.reshape(-1), jj.reshape(-1)], axis=-1)   # [P,2]
    cheb = jnp.max(jnp.abs(pos[:, None, :] - pos[None, :, :]), axis=-1)
    neigh = (cheb <= rex) & (cheb > 0)                           # [P,P]

    vflat = valid.reshape(b, p)
    w = (vflat > 0.999).astype(jnp.float32)                      # anchors
    # Mask: neighbours and invalid candidates leave the denominator; the
    # positive (diagonal) always stays.
    excl = (neigh[None] | (vflat[:, None, :] < 0.999)) & \
        ~jnp.eye(p, dtype=bool)[None]
    neg_mask = ~excl & ~jnp.eye(p, dtype=bool)[None]             # negatives

    def one_dir(s):
        lg = jnp.where(excl, -1e9, s)
        diag = jnp.einsum('bpp->bp', lg)
        if hard_beta > 0.0:
            def mlse(x):                                         # masked lse
                return jax.nn.logsumexp(jnp.where(neg_mask, x, -1e9),
                                        axis=-1)
            n_neg = jnp.sum(neg_mask, axis=-1).astype(jnp.float32)
            log_neg = (jnp.log(n_neg + 1e-6)
                       + mlse((1.0 + hard_beta) * s) - mlse(hard_beta * s))
            lse = jnp.logaddexp(diag, log_neg)                   # [B,P]
        else:
            lse = jax.nn.logsumexp(lg, axis=-1)                  # [B,P]
        loss = jnp.sum((lse - diag) * w) / (jnp.sum(w) + 1e-6)
        acc = jnp.sum((jnp.argmax(lg, -1) == jnp.arange(p)[None]) * w) \
            / (jnp.sum(w) + 1e-6)
        return loss, acc

    la, aa = one_dir(sim)
    lb, ab = one_dir(sim.transpose(0, 2, 1))
    return 0.5 * (la + lb), 0.5 * (aa + ab)


def basin_ratio(fw1, fw1e, f2, valid, valide):
    """Per-sample normalized misalignment contrast in [-1, 1]:
    (d_eps - d_0) / (d_eps + d_0), where d_* is the warp-support-masked
    mean absolute feature distance to f2 — the same quantity the
    biHomE l1 term measures (heads/assembled.py triplet distances).
    Maximizing it makes the feature distance strictly increase with
    sub-4px misalignment, scale-free (the distill term anchors the
    absolute magnitudes)."""
    w = ((valid > 0.999) & (valide > 0.999)).astype(jnp.float32)
    wsum = jnp.sum(w, axis=(1, 2)) + 1e-6

    def mdist(fa):
        d = jnp.mean(jnp.abs(fa - f2), axis=-1)                # [B,Hf,Wf]
        return jnp.sum(d * w, axis=(1, 2)) / wsum

    d0, de = mdist(fw1), mdist(fw1e)
    return jnp.mean((de - d0) / (de + d0 + 1e-6))


def warp_gt(patch_2, delta):
    """Warp patch_2 by the ground-truth delta exactly as the biHomE head
    warps it by delta_hat (heads/assembled.py:_warp_with_support), plus the
    closed-form support mask."""
    b, h, w = patch_2.shape[0], patch_2.shape[1], patch_2.shape[2]
    corners = geometry.image_corners(h, w, batch_size=b, dtype=jnp.float32)
    homography = geometry.four_point_to_homography(corners, delta)
    u, v = geometry.homography_grid(homography, (h, w))
    warped = geometry.batched_sample(patch_2, u, v).reshape(patch_2.shape)
    mask = geometry.ones_warp_mask(u, v, (h, w)).reshape(b, h, w, 1)
    return warped, mask


def main(args):
    out_layer = args.layers if args.pretext.startswith('grad') else None
    # Feature geometry of the truncated resnet34: layer-k features have
    # stride 2^(k+1) and 64*2^(k-1) channels (models/resnet.py). The
    # distill targets and the InfoNCE valid-mask pooling must match.
    stride = 2 ** (args.layers + 1)
    out_dim = 64 * 2 ** (args.layers - 1)
    model = ResNet(arch='resnet34', num_classes=4, output_layer=out_layer,
                   dtype=jnp.bfloat16)
    is_cl = args.pretext.endswith('cl')
    spec = pipeline.PairSpec(rho=32, patch_size=128, photometric_keys=(),
                             max_delta=0.0)
    # cl variants draw REAL homography pairs through the standard datagen;
    # gradpdscl additionally runs the full PDS photometric chain on both
    # views independently (invariance learned by the contrastive term).
    cl_spec = pipeline.PairSpec(
        rho=32, patch_size=128,
        photometric_keys=(('image_1', 'image_2')
                          if args.pretext == 'gradpdscl' else ()),
        max_delta=32.0 if args.pretext == 'gradpdscl' else 0.0)
    pool = jnp.asarray(synthetic.make_image_pool(args.pool, 240, 320,
                                                 seed=args.seed))

    def make_batch(key):
        k_idx, k_gen, k_rot = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (args.batch,), 0, pool.shape[0])
        batch = pipeline.generate_pairs(pipeline.take_images(pool, idx),
                                        k_gen, spec)
        x = batch['patch_1']                                   # [B,128,128,1]
        rot = jax.random.randint(k_rot, (args.batch,), 0, 4)
        # rot90 by k: compose flips/transposes selected per sample.
        x90 = jnp.transpose(x[:, :, ::-1], (0, 2, 1, 3))
        x180 = x[:, ::-1, ::-1]
        x270 = jnp.transpose(x, (0, 2, 1, 3))[:, :, ::-1]
        stacked = jnp.stack([x, x90, x180, x270], axis=1)
        x = jnp.take_along_axis(
            stacked, rot[:, None, None, None, None], axis=1)[:, 0]
        return x, rot

    def make_grad_batch(key):
        k_idx, k_gen, k_b, k_c = jax.random.split(key, 4)
        idx = jax.random.randint(k_idx, (args.batch,), 0, pool.shape[0])
        if args.pretext == 'gradpds':
            # Invariance to the REAL PDS distortion chain: crop an RGB
            # patch, target from its clean grayscale, input from the full
            # PhotometricDistortSimple chain (brightness/contrast/HSV/
            # channel-permutation, ref: src/data/transforms.py:296-330)
            # applied to the same RGB patch. Well-posed on the
            # natural-statistics pool (see data/synthetic.py): the
            # grayscale structure survives the distortion, so the network
            # can actually learn the invariance.
            imgs = pipeline.take_images(pool, idx).astype(jnp.float32)
            b, h, w, _ = imgs.shape
            kx, ky, kpd = jax.random.split(k_gen, 3)
            ox = jax.random.randint(kx, (args.batch,), 0, w - 128 + 1)
            oy = jax.random.randint(ky, (args.batch,), 0, h - 128 + 1)
            rgb = geometry.crop_integer(imgs, ox, oy, (128, 128))
            std = lambda g: color.standardize(g, spec.standardize_mean,
                                              spec.standardize_std)
            target = grad_targets_pi(std(color.rgb_to_grayscale(rgb)),
                                     stride=stride, out_dim=out_dim)
            distorted = jax.vmap(
                photometric.photometric_distort_simple,
                in_axes=(0, 0, None))(rgb, jax.random.split(kpd, args.batch),
                                      32.0)
            return std(color.rgb_to_grayscale(distorted)), target
        batch = pipeline.generate_pairs(pipeline.take_images(pool, idx),
                                        k_gen, spec)
        x = batch['patch_1']                                   # [B,128,128,1]
        if args.pretext == 'gradpi':
            # Invariance training: target from the CLEAN patch, input
            # brightness/contrast-jittered (the dominant post-grayscale
            # modes of the reference's PhotometricDistortSimple).
            target = grad_targets_pi(x, stride=stride, out_dim=out_dim)
            b = jax.random.uniform(k_b, (args.batch, 1, 1, 1),
                                   minval=-0.5, maxval=0.5)
            c = jax.random.uniform(k_c, (args.batch, 1, 1, 1),
                                   minval=0.6, maxval=1.5)
            return c * (x + b), target
        return x, grad_targets(x, stride=stride, out_dim=out_dim)

    def make_cl_batch(key):
        """Two views in correspondence: warp_gt(patch_1, delta) aligns
        patch_1 to patch_2 (the head's loss-warp convention — it warps
        patch_1 by delta_hat and compares against patch_2,
        heads/assembled.py:_multihead_loss/_triplet_resnet_loss)."""
        k_idx, k_gen, k_eps, k_s = jax.random.split(key, 4)
        idx = jax.random.randint(k_idx, (args.batch,), 0, pool.shape[0])
        batch = pipeline.generate_pairs(pipeline.take_images(pool, idx),
                                        k_gen, cl_spec)
        x2 = batch['patch_2']                                  # [B,128,128,1]
        w1, mask = warp_gt(batch['patch_1'], batch['delta'])
        valid = nnavg_pool(mask, stride)[..., 0]               # [B,H/s,W/s]
        # Distill-anchor BOTH views (each target computed from that view's
        # own pixels): the InfoNCE is per-position normalized, so without
        # an anchor on the warped view its magnitudes are unconstrained —
        # a first attempt anchored only x2 and the extractor learned 13x
        # larger activations on warped inputs, inverting the biHomE
        # triplet (l1 >> l3 at the gt warp; run log in BENCH_NOTES.md).
        tfn = ((lambda v: grad_targets_pi(v, stride=stride, out_dim=out_dim))
               if args.pretext == 'gradpdscl'
               else (lambda v: grad_targets(v, rich=args.rich_target,
                                            stride=stride, out_dim=out_dim)))
        if args.basin_weight <= 0:
            return w1, x2, valid, (tfn(w1), tfn(x2)), None
        # Basin-sharpening view: the SAME patch_1 warped by an
        # eps-perturbed delta (0.5-4 px per corner coordinate). The biHomE
        # training signal at convergence is the feature-distance increase
        # between the exact warp and a slightly-wrong one; the InfoNCE
        # terms only discriminate 4px feature-GRID positions, leaving
        # that sub-cell slope unshaped (the ~2px flagship MACE floor).
        s = jax.random.uniform(k_s, (args.batch, 1, 1),
                               minval=0.5, maxval=4.0)
        eps = jax.random.uniform(k_eps, (args.batch, 4, 2),
                                 minval=-1.0, maxval=1.0) * s
        w1e, maske = warp_gt(batch['patch_1'], batch['delta'] + eps)
        valide = nnavg_pool(maske, stride)[..., 0]
        return w1, x2, valid, (tfn(w1), tfn(x2)), (w1e, valide)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 128, 128, 1)), train=False)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables['params'])

    def train_step(params, batch_stats, opt_state, key):
        if is_cl:
            w1, x2, valid, target, basin = make_cl_batch(key)
        elif args.pretext.startswith('grad'):
            x, target = make_grad_batch(key)
        else:
            x, rot = make_batch(key)

        def loss_fn(p):
            if is_cl:
                views = [w1, x2] + ([basin[0]] if basin else [])
                out, mut = model.apply(
                    {'params': p, 'batch_stats': batch_stats},
                    jnp.concatenate(views, axis=0), train=True,
                    mutable=['batch_stats'])
                parts = jnp.split(out.astype(jnp.float32), len(views),
                                  axis=0)
                fw1, f2 = parts[0], parts[1]
                t_w1, t_x2 = target
                mse = 0.5 * (jnp.mean((fw1 - t_w1) ** 2)
                             + jnp.mean((f2 - t_x2) ** 2))
                nce, acc = dense_infonce(fw1, f2, valid, tau=args.tau,
                                         rex=args.rex,
                                         hard_beta=args.cl_hard_beta)
                distill_w = 0.25 if args.pretext == 'gradpdscl' else 1.0
                loss = distill_w * mse + args.cl_weight * nce
                if basin:
                    ratio = basin_ratio(fw1, parts[2], f2, valid, basin[1])
                    loss = loss - args.basin_weight * ratio
                    # Report the contrast instead of InfoNCE accuracy once
                    # the basin term is active (acc saturates at ~0.99
                    # early; the ratio is the signal being tuned).
                    acc = ratio
                if args.cl_fine_weight > 0:
                    # Fine term: rex=0 keeps the immediate (4px-away)
                    # neighbors IN the negatives — the rex=2 term
                    # deliberately broadens the basin by excluding them,
                    # but that leaves the sub-8px optimum soft, which is
                    # where the flagship's ~2px MACE floor lives
                    # (BENCH_NOTES.md contrastive-extractor section).
                    nce_fine, _ = dense_infonce(fw1, f2, valid,
                                                tau=args.tau, rex=0,
                                                hard_beta=args.cl_hard_beta)
                    loss = loss + args.cl_fine_weight * nce_fine
                return loss, (mut['batch_stats'], acc)
            out, mut = model.apply(
                {'params': p, 'batch_stats': batch_stats}, x, train=True,
                mutable=['batch_stats'])
            if args.pretext.startswith('grad'):
                loss = jnp.mean((out.astype(jnp.float32) - target) ** 2)
                acc = 1.0 - loss / jnp.mean(target ** 2)  # R^2-style proxy
            else:
                loss = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(out, rot))
                acc = jnp.mean(
                    (jnp.argmax(out, -1) == rot).astype(jnp.float32))
            return loss, (mut['batch_stats'], acc)

        (loss, (batch_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss, acc

    @jax.jit
    def train_block(params, batch_stats, opt_state, key, base):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state,
                jax.random.fold_in(key, base + i))
            return (params, batch_stats, opt_state), (loss, acc)
        carry, (losses, accs) = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(args.unroll))
        return carry + (losses[-1], accs[-1])

    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    key = jax.random.PRNGKey(args.seed)
    for blk in range(args.steps // args.unroll):
        params, batch_stats, opt_state, loss, acc = train_block(
            params, batch_stats, opt_state, key, blk * args.unroll)
        if blk % 5 == 0:
            print(f'step {blk * args.unroll}: loss={float(loss):.4f} '
                  f'acc={float(acc):.3f}', flush=True)

    aux_store.save_aux_npz(args.out, {'params': jax.device_get(params),
                                      'batch_stats': jax.device_get(
                                          batch_stats)})
    kept = '/'.join(['conv1', 'bn1'] +
                    [f'layer{k}' for k in range(1, args.layers + 1)])
    print(f'Saved aux extractor ({kept}) to {args.out}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=1500)
    p.add_argument('--unroll', type=int, default=20)
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--pool', type=int, default=256)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--out', type=str, default='aux_rotnet.npz')
    p.add_argument('--cl_weight', type=float, default=0.3,
                   help='weight of the dense InfoNCE term (cl pretexts)')
    p.add_argument('--cl_fine_weight', type=float, default=0.0,
                   help='weight of an additional rex=0 InfoNCE term '
                        '(immediate neighbors as negatives — sharpens '
                        'sub-cell feature localization)')
    p.add_argument('--tau', type=float, default=0.15,
                   help='InfoNCE temperature (cl pretexts)')
    p.add_argument('--basin_weight', type=float, default=0.0,
                   help='weight of the basin-sharpening ratio term: feature '
                        'distance to the aligned view must increase under a '
                        '0.5-4px corner-jittered warp (shapes the sub-4px '
                        'slope the InfoNCE grid terms cannot see)')
    p.add_argument('--rich_target', action='store_true',
                   help='richer grad distill target (diagonal derivatives + '
                        'Laplacian per scale; intrinsic rank ~24 vs ~12)')
    p.add_argument('--cl_hard_beta', type=float, default=0.0,
                   help='hard-negative importance weighting exponent for '
                        'the InfoNCE terms (Robinson et al. 2021); 0 = '
                        'uniform negatives. Upweights look-alike positions '
                        '(repeated texture / aperture-problem edges) in '
                        'the partition function')
    p.add_argument('--layers', type=int, default=1, choices=(1, 2),
                   help='resnet truncation depth of the trained extractor: '
                        '1 = conv1/bn1/layer1 (stride-4, 64ch — the '
                        'reference operating point), 2 = +layer2 (stride-8, '
                        '128ch). Use with MODEL.HEAD.'
                        'AUXILIARY_RESNET_OUTPUT_LAYER=2 at train time')
    p.add_argument('--rex', type=int, default=2,
                   help='neighbor-exclusion Chebyshev radius in feature px')
    p.add_argument('--pretext', choices=('rotnet', 'grad', 'gradpi',
                                         'gradpds', 'gradcl', 'gradpdscl'),
                   default='rotnet',
                   help="'grad': distill fixed multi-scale local-gradient "
                        "features (dense, localizable — alignment-friendly)")
    main(p.parse_args())
