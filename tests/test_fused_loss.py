"""ops/fused_loss.py — fused biHomE distance/mask-norm chain vs the
open-coded formulation (values AND gradients, every margin/aggregation
variant the double-line branch supports).

The open-coded oracle below mirrors heads/assembled.py's unfused
double-line branch verbatim (ref: src/heads/PerceptualHead.py:540-665);
test_loss_golden.py separately pins that branch against the torch
oracle, so agreement here closes the chain fused == unfused == torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bihome_tpu.ops import fused_loss


def _aggregate(l_pos, l_anchor, margin, aggregation, second):
    if isinstance(margin, str):
        if aggregation == 'channel-aware':
            return jnp.sum(l_pos - l_anchor, axis=-1)
        return jnp.sum(l_pos, axis=-1) - jnp.sum(l_anchor, axis=-1)
    if aggregation == 'channel-aware':
        return jnp.sum(jnp.maximum(l_pos - l_anchor + margin, 0.0), axis=-1)
    eff = margin * l_pos.shape[-1] if second else margin
    return jnp.maximum(jnp.sum(l_pos, axis=-1)
                       - jnp.sum(l_anchor, axis=-1) + eff, 0.0)


def oracle(fp_w, f_plain, w1, w2, margin, aggregation, second_scale=True):
    b = fp_w.shape[0] // 2
    f1p, f2p = fp_w[:b], fp_w[b:]
    f1, f2 = f_plain[:b], f_plain[b:]
    l1 = jnp.abs(f1p - f2)
    l2 = jnp.abs(f2p - f1)
    l3 = jnp.abs(f1 - f2)
    lm1 = _aggregate(l1, l3, margin, aggregation, second=False)
    lm2 = _aggregate(l2, l3, margin, aggregation, second=second_scale)
    den1 = jnp.sum(w1, axis=(-2, -1))
    den2 = jnp.sum(w2, axis=(-2, -1))
    ln1 = jnp.sum(jnp.sum(w1 * lm1, axis=(-2, -1))
                  / jnp.maximum(den1, 1.0))
    ln2 = jnp.sum(jnp.sum(w2 * lm2, axis=(-2, -1))
                  / jnp.maximum(den2, 1.0))
    metrics = (jnp.mean(l1), jnp.mean(l2), jnp.mean(l3),
               jnp.mean(f1), jnp.mean(f2), jnp.mean(f1p),
               jnp.min(den1), jnp.min(den2))
    return ln1, ln2, metrics


def _inputs(key, b=3, h=6, w=5, c=8, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    fp_w = jax.random.normal(ks[0], (2 * b, h, w, c), jnp.float32)
    f_plain = jax.random.normal(ks[1], (2 * b, h, w, c), jnp.float32)
    # Support-mask-like weights in (0, 1), no exact ties with the den
    # clamp at 1.0.
    w1 = jax.random.uniform(ks[2], (b, h, w), minval=0.05, maxval=1.0)
    w2 = jax.random.uniform(ks[3], (b, h, w), minval=0.05, maxval=1.0)
    return (fp_w.astype(dtype), f_plain.astype(dtype),
            w1.astype(dtype), w2.astype(dtype))


VARIANTS = [
    (0.02, 'channel-aware'),
    (0.02, 'channel-agnostic'),
    ('inf', 'channel-aware'),
    ('inf', 'channel-agnostic'),
]


@pytest.mark.parametrize('margin,agg', VARIANTS)
def test_forward_matches_oracle(margin, agg):
    args = _inputs(jax.random.PRNGKey(0))
    got = fused_loss.triplet_double_line(*args, margin, agg, True, False)
    want = oracle(*args, margin, agg)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-6, atol=1e-6)
    for g, w in zip(got[2], want[2]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('margin,agg', VARIANTS)
def test_gradients_match_autodiff_of_oracle(margin, agg):
    """d(a*ln1 + b*ln2) wrt the warped-feature stack and both mask
    weights must equal XLA autodiff of the open-coded chain. f_plain is
    non-differentiable by spec (the caller stop_gradients it)."""
    fp_w, f_plain, w1, w2 = _inputs(jax.random.PRNGKey(1))

    def loss_fused(fp_w, w1, w2):
        ln1, ln2, _ = fused_loss.triplet_double_line(
            fp_w, f_plain, w1, w2, margin, agg, True, False)
        return 0.7 * ln1 + 1.3 * ln2

    def loss_oracle(fp_w, w1, w2):
        ln1, ln2, _ = oracle(fp_w, jax.lax.stop_gradient(f_plain),
                             w1, w2, margin, agg)
        return 0.7 * ln1 + 1.3 * ln2

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(fp_w, w1, w2)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))(fp_w, w1, w2)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_den_clamp_gradient():
    """Masks summing below 1 activate the max(den, 1) clamp: the den term
    of d/dw must vanish there, matching autodiff."""
    fp_w, f_plain, w1, w2 = _inputs(jax.random.PRNGKey(2))
    w1 = w1 * 0.01          # sum ~ 0.15 << 1 -> clamped
    margin, agg = 0.02, 'channel-aware'

    def fused(w1):
        ln1, _, _ = fused_loss.triplet_double_line(
            fp_w, f_plain, w1, w2, margin, agg, True, False)
        return ln1

    def orac(w1):
        ln1, _, _ = oracle(fp_w, f_plain, w1, w2, margin, agg)
        return ln1

    np.testing.assert_allclose(np.asarray(jax.grad(fused)(w1)),
                               np.asarray(jax.grad(orac)(w1)),
                               rtol=1e-5, atol=1e-6)


def test_bf16_inputs():
    """bf16 feature maps (the flagship compute dtype): fused internally
    accumulates in f32; agreement with the f32 oracle within bf16
    rounding of the inputs."""
    fp_w, f_plain, w1, w2 = _inputs(jax.random.PRNGKey(3),
                                    dtype=jnp.bfloat16)
    got = fused_loss.triplet_double_line(fp_w, f_plain, w1, w2,
                                         0.02, 'channel-aware', True, False)
    want = oracle(fp_w.astype(jnp.float32), f_plain.astype(jnp.float32),
                  w1.astype(jnp.float32), w2.astype(jnp.float32),
                  0.02, 'channel-aware')
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=2e-2)


def test_assembled_model_fused_vs_unfused(monkeypatch):
    """End-to-end through the full PerceptualHead (warps, support masks,
    mask pooling): loss and backbone gradients identical (up to float
    assoc) with BIHOME_LOSS_FUSE on vs off."""
    from bihome_tpu.heads import AssembledModel, HeadConfig
    from bihome_tpu.models import backbones
    from tests.test_heads import PS, make_batch

    batch = make_batch()
    backbone = backbones.ResNet34Backbone(
        variant='doubleline', target_keys=('delta_hat_12', 'delta_hat_21'))
    head = HeadConfig(
        name='PerceptualHead', patch_size=PS,
        patch_keys=('patch_1', 'patch_2'),
        delta_hat_keys=('delta_hat_12', 'delta_hat_21'), pf_keys=(),
        auxiliary_resnet='resnet34', auxiliary_resnet_output_layer=1,
        triplet_loss='double-line', triplet_aggregation='channel-aware',
        triplet_margin=0.02, triplet_distance='l1', triplet_mu=0.01,
        mask_keys=(), sampling_strategy='downsample-mask')
    model = AssembledModel(backbone=backbone, head=head)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss_of(params):
        out = model.apply({**variables, 'params': params}, batch)
        return out['loss'], out['metrics']

    def run():
        (loss, metrics), grads = jax.value_and_grad(
            loss_of, has_aux=True)(variables['params'])
        return loss, metrics, grads

    monkeypatch.setenv('BIHOME_LOSS_FUSE', 'off')
    base_loss, base_metrics, base_g = run()
    monkeypatch.setenv('BIHOME_LOSS_FUSE', 'on')
    fused_loss_v, fused_metrics, fused_g = run()
    np.testing.assert_allclose(float(fused_loss_v), float(base_loss),
                               rtol=1e-5)
    for key in base_metrics:
        np.testing.assert_allclose(
            np.asarray(fused_metrics[key]), np.asarray(base_metrics[key]),
            rtol=1e-4, atol=1e-6, err_msg=key)
    # Gradient deltas are float-association noise only (measured max
    # ~4e-6 abs on unit-scale grads); atol dominates for tiny elements.
    for a, b in zip(jax.tree_util.tree_leaves(base_g['backbone']),
                    jax.tree_util.tree_leaves(fused_g['backbone'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize('margin,agg', VARIANTS)
def test_plain_grad_flavor_matches_autodiff(margin, agg):
    """zhang/TripletHead flavor: learned features on BOTH sides
    (plain_grad=True) and no second-direction margin*C quirk
    (second_scale=False) — all four cotangents must match autodiff."""
    fp_w, f_plain, w1, w2 = _inputs(jax.random.PRNGKey(4))

    def loss_fused(fp_w, f_plain, w1, w2):
        ln1, ln2, _ = fused_loss.triplet_double_line(
            fp_w, f_plain, w1, w2, margin, agg, False, True)
        return 0.7 * ln1 + 1.3 * ln2

    def loss_oracle(fp_w, f_plain, w1, w2):
        ln1, ln2, _ = oracle(fp_w, f_plain, w1, w2, margin, agg,
                             second_scale=False)
        return 0.7 * ln1 + 1.3 * ln2

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(
        fp_w, f_plain, w1, w2)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3)))(
        fp_w, f_plain, w1, w2)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_triplet_head_fused_vs_unfused(monkeypatch):
    """End-to-end through the zhang ContentAware + TripletHead chain:
    loss, metrics, and parameter gradients identical with
    BIHOME_LOSS_FUSE on vs off."""
    from bihome_tpu.heads import AssembledModel, HeadConfig
    from bihome_tpu.models import backbones
    from tests.test_heads import PS, make_batch

    batch = make_batch()
    backbone = backbones.ContentAwareBackbone(
        variant='doubleline', fix_mask=False,
        patch_keys=('patch_1', 'patch_2'),
        mask_keys=('mask_1', 'mask_2'),
        feature_keys=('feature_1', 'feature_2'),
        target_keys=('delta_hat_12', 'delta_hat_21'))
    head = HeadConfig(
        name='TripletHead', variant='doubleline', patch_size=PS,
        patch_keys=('patch_1', 'patch_2'),
        mask_keys=('mask_1', 'mask_2'),
        feature_keys=('feature_1', 'feature_2'),
        target_keys=('delta_hat_12', 'delta_hat_21'),
        triplet_margin=1.0, triplet_aggregation='channel-agnostic',
        ld=2, mu=0.01)
    model = AssembledModel(backbone=backbone, head=head)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss_of(params):
        out = model.apply({**variables, 'params': params}, batch)
        return out['loss'], out['metrics']

    def run():
        (loss, metrics), grads = jax.value_and_grad(
            loss_of, has_aux=True)(variables['params'])
        return loss, metrics, grads

    monkeypatch.setenv('BIHOME_LOSS_FUSE', 'off')
    base_loss, base_metrics, base_g = run()
    monkeypatch.setenv('BIHOME_LOSS_FUSE', 'on')
    fused_loss_v, fused_metrics, fused_g = run()
    np.testing.assert_allclose(float(fused_loss_v), float(base_loss),
                               rtol=1e-5)
    for key in base_metrics:
        np.testing.assert_allclose(
            np.asarray(fused_metrics[key]), np.asarray(base_metrics[key]),
            rtol=1e-4, atol=1e-6, err_msg=key)
    for a, b in zip(jax.tree_util.tree_leaves(base_g),
                    jax.tree_util.tree_leaves(fused_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
