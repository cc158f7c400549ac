"""Golden LOSS-VALUE parity vs an independent torch oracle.

The property tests in test_heads.py prove the losses are finite, prefer
the true delta, and propagate gradients — but a sign/aggregation/
normalization error could survive them. These tests pin the actual loss
VALUES of the JAX heads against tests/torch_loss_oracle.py (reference
math re-assembled from torch primitives + float64 homography solves)
with IDENTICAL extractor weights ported via models/torch_port:

  * biHomE (PerceptualHead) across the config grid: double-line / one-line
    x margin 'inf'/float x channel-aware/agnostic x masks on/off x the
    margin*C second-element quirk x l1/cosine distance x mask_crd
    (ref: src/heads/PerceptualHead.py:320-714).
  * Zhang CA-UDHN (TripletHead) through the FULL ContentAware backbone —
    mask predictor, feature extractor, resnet34 regressor — so the
    backbone assembly (g = m*f, [g1;g2] / [g2;g1] passes) is value-checked
    too (ref: src/heads/TripletHead.py:37-199,
    src/backbones/ContentAware.py:83-193).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from bihome_tpu.heads import AssembledModel, HeadConfig          # noqa: E402
from bihome_tpu.models import backbones, torch_port              # noqa: E402
from tests import torch_loss_oracle as loss_oracle              # noqa: E402
from tests import torch_rethinking_oracle as ca_oracle          # noqa: E402
from tests.torch_resnet_oracle import ResNet34                  # noqa: E402

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m "not slow"

PS = 32
B = 2


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _no_abstract_leaves(tree):
    return all(hasattr(leaf, 'dtype') and not isinstance(
        leaf, jax.ShapeDtypeStruct)
        for leaf in jax.tree_util.tree_leaves(tree))


def _inputs(seed, with_masks):
    rng = np.random.RandomState(seed)
    p1 = rng.randn(B, PS, PS, 1).astype(np.float32)
    p2 = rng.randn(B, PS, PS, 1).astype(np.float32)
    d12 = rng.uniform(-6, 6, (B, 4, 2)).astype(np.float32)
    d21 = rng.uniform(-6, 6, (B, 4, 2)).astype(np.float32)
    m1 = m2 = None
    if with_masks:
        m1 = (rng.rand(B, PS, PS, 1) * 0.8 + 0.2).astype(np.float32)
        m2 = (rng.rand(B, PS, PS, 1) * 0.8 + 0.2).astype(np.float32)
    return p1, p2, d12, d21, m1, m2


@pytest.fixture(scope='module')
def aux_torch():
    """Frozen aux extractor: random-weight torchvision-layout resnet34
    truncated at layer1, non-trivial BN running stats, eval mode."""
    torch.manual_seed(0)
    net = ResNet34(num_classes=10, in_channels=3)
    with torch.no_grad():
        ca_oracle.randomize_bn_stats(net, np.random.RandomState(3))
    net.eval()

    def extract(x):                     # [B,1,h,w] -> [B,64,h/4,w/4]
        with torch.no_grad():
            return net.forward_features_layer1(x.repeat(1, 3, 1, 1))

    sd = {k: v for k, v in _state_np(net).items()
          if not k.startswith(('layer2', 'layer3', 'layer4', 'fc'))}
    ported = torch_port.port_torchvision_resnet(sd, include_fc=False,
                                                sum_rgb_stem=True)
    return extract, ported


BIHOME_GRID = [
    # (triplet_loss, margin, aggregation, distance, masks, mask_crd)
    ('double-line', 'inf', 'channel-aware', 'l1', False, False),  # flagship
    ('double-line', 'inf', 'channel-agnostic', 'l1', False, False),
    ('double-line', 0.5, 'channel-aware', 'l1', True, False),
    ('double-line', 0.03, 'channel-agnostic', 'l1', True, False),  # *C quirk
    ('one-line', 0.5, 'channel-aware', 'l1', False, False),
    ('one-line', 0.2, 'channel-aware', 'cosine', False, False),
    ('one-line', 0.5, 'channel-aware', 'l1', True, True),  # MASK_CRD
]


@pytest.mark.parametrize(
    'triplet_loss,margin,aggregation,distance,with_masks,mask_crd',
    BIHOME_GRID)
def test_bihome_loss_value_parity(aux_torch, triplet_loss, margin,
                                  aggregation, distance, with_masks,
                                  mask_crd):
    extract, ported = aux_torch
    p1, p2, d12, d21, m1, m2 = _inputs(11, with_masks)
    doubleline = 'double-line' in triplet_loss

    # ---- torch oracle ------------------------------------------------ #
    def nchw(x):
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    want, want_parts = loss_oracle.bihome_loss(
        extract, nchw(p1), nchw(p2), d12, d21 if doubleline else None,
        mask_1=nchw(m1) if with_masks else None,
        mask_2=nchw(m2) if with_masks else None,
        triplet_loss=triplet_loss, triplet_margin=margin,
        triplet_aggregation=aggregation, triplet_distance=distance,
        triplet_mu=0.01, mask_crd=mask_crd)

    # ---- JAX implementation ------------------------------------------ #
    d12_j, d21_j = jnp.asarray(d12), jnp.asarray(d21)

    class FixedDelta(backbones.ResNet34Backbone):
        def __call__(self, data, train=False):
            out = {'delta_hat_12': d12_j}
            if doubleline:
                out['delta_hat_21'] = d21_j
            return out

    head = HeadConfig(
        name='PerceptualHead', patch_size=PS,
        patch_keys=('patch_1', 'patch_2'),
        delta_hat_keys=(('delta_hat_12', 'delta_hat_21') if doubleline
                        else ('delta_hat_12',)),
        pf_keys=(), auxiliary_resnet='resnet34',
        auxiliary_resnet_output_layer=1,
        mask_keys=('mask_1', 'mask_2') if with_masks else (),
        triplet_loss=triplet_loss, triplet_margin=margin,
        triplet_aggregation=aggregation, triplet_distance=distance,
        triplet_mu=0.01, mask_crd=mask_crd,
        sampling_strategy='downsample-mask')
    model = AssembledModel(backbone=FixedDelta(), head=head)

    batch = {'patch_1': jnp.asarray(p1), 'patch_2': jnp.asarray(p2)}
    if with_masks:
        batch['mask_1'] = jnp.asarray(m1)
        batch['mask_2'] = jnp.asarray(m2)

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    variables = torch_port.graft(variables, ported, ('auxiliary_resnet',))
    assert _no_abstract_leaves(variables), 'port did not cover all leaves'

    out = model.apply(variables, batch)
    got = float(out['loss'])

    np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-2)
    if doubleline:
        for part in ('ln1', 'ln2', 'ln3'):
            np.testing.assert_allclose(
                float(out['metrics'][f'loss_comp/{part}']),
                want_parts[part], rtol=3e-3, atol=1e-2,
                err_msg=f'component {part}')


@pytest.mark.parametrize('margin,aggregation', [
    ('inf', 'channel-aware'),
    (1.0, 'channel-agnostic'),          # shipped zhang-orig semantics
])
def test_zhang_triplet_loss_value_parity_full_chain(margin, aggregation):
    """TripletHead golden THROUGH the ContentAware backbone: torch and JAX
    compute masks/features/deltas from the same ported weights, then the
    triplet loss; values must agree end to end."""
    rng = np.random.RandomState(5)
    ps = 24
    p1 = rng.randn(B, ps, ps, 1).astype(np.float32)
    p2 = rng.randn(B, ps, ps, 1).astype(np.float32)

    torch.manual_seed(1)
    mask_t = ca_oracle.MaskPredictorTorch()
    feat_t = ca_oracle.FeatureExtractorTorch()
    reg_t = ResNet34(num_classes=8, in_channels=2)
    with torch.no_grad():
        ca_oracle.randomize_bn_stats(mask_t, rng)
        ca_oracle.randomize_bn_stats(feat_t, rng)
        ca_oracle.randomize_bn_stats(reg_t, rng)
    mask_t.eval()
    feat_t.eval()
    reg_t.eval()

    # ---- torch oracle: full ContentAware forward + TripletHead -------- #
    t1 = torch.from_numpy(p1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(p2.transpose(0, 3, 1, 2))
    with torch.no_grad():
        m1, f1 = mask_t(t1), feat_t(t1)
        m2, f2 = mask_t(t2), feat_t(t2)
        g1, g2 = m1 * f1, m2 * f2
        d12 = reg_t(torch.cat([g1, g2], dim=1)).reshape(-1, 4, 2)
        d21 = reg_t(torch.cat([g2, g1], dim=1)).reshape(-1, 4, 2)

    def feat_fn(x):
        with torch.no_grad():
            return feat_t(x)

    want = loss_oracle.zhang_triplet_loss(
        feat_fn, t1, t2, m1, m2, f1, f2,
        d12.numpy(), d21.numpy(), variant='doubleline',
        triplet_margin=margin, triplet_aggregation=aggregation, mu=0.01)

    # ---- JAX: assembled ContentAware + TripletHead -------------------- #
    backbone = backbones.ContentAwareBackbone(
        variant='doubleline',
        target_keys=('delta_hat_12', 'delta_hat_21'))
    head = HeadConfig(name='TripletHead', variant='doubleline',
                      patch_keys=('patch_1', 'patch_2'),
                      mask_keys=('mask_1', 'mask_2'),
                      feature_keys=('feature_1', 'feature_2'),
                      target_keys=('delta_hat_12', 'delta_hat_21'),
                      triplet_margin=margin,
                      triplet_aggregation=aggregation,
                      ld=2, mu=0.01, patch_size=ps)
    model = AssembledModel(backbone=backbone, head=head)
    batch = {'patch_1': jnp.asarray(p1), 'patch_2': jnp.asarray(p2)}

    sd_ca = {}
    for prefix, mod in (('mask_predictor', mask_t),
                        ('feature_extractor', feat_t)):
        for k, v in _state_np(mod).items():
            sd_ca[f'{prefix}.{k}'] = v
    ported_ca = torch_port.port_content_aware(sd_ca)
    ported_reg = torch_port.port_torchvision_resnet(_state_np(reg_t))

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    variables = torch_port.graft(variables, ported_ca, ('backbone',))
    variables = torch_port.graft(variables, ported_reg,
                                 ('backbone', 'resnet34'))
    assert _no_abstract_leaves(variables), 'port did not cover all leaves'

    # Backbone-output parity first (better failure isolation).
    bb_vars = {'params': variables['params']['backbone'],
               'batch_stats': variables['batch_stats']['backbone']}
    bb_out = backbone.apply(bb_vars, batch, train=False)
    np.testing.assert_allclose(np.asarray(bb_out['delta_hat_12']),
                               d12.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(bb_out['mask_1']), (0, 3, 1, 2)),
        m1.numpy(), rtol=1e-4, atol=1e-5)

    out = model.apply(variables, batch)
    got = float(out['loss'])
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-2)


# --------------------------------------------------------------------- #
# Round-4 variant coverage (VERDICT r3 item 4): projection head,
# upsample-patch-{2,4}x, 'dual' — all value-pinned vs the torch oracle.
# --------------------------------------------------------------------- #


def test_bihome_projection_head_value_parity(aux_torch):
    """WITH_PROJECTION_HEAD (ref: PerceptualHead.py:40-48,63-76): linear
    projection after the frozen extractor + per-pixel channel L2
    normalization inside the one-line loss (ref: :470-497)."""
    extract, ported = aux_torch
    p1, p2, d12, _, _, _ = _inputs(21, with_masks=False)

    torch.manual_seed(7)
    lin0 = torch.nn.Linear(64, 32)
    lin1 = torch.nn.Linear(32, 8)

    def nchw(x):
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    def extract_proj(x):
        with torch.no_grad():
            f = extract(x).permute(0, 2, 3, 1)       # NHWC
            f = lin1(torch.relu(lin0(f)))
            return f.permute(0, 3, 1, 2)

    want, _ = loss_oracle.bihome_loss(
        extract_proj, nchw(p1), nchw(p2), d12, None,
        triplet_loss='one-line', triplet_margin=0.5,
        triplet_aggregation='channel-aware', triplet_distance='l1',
        normalize_features=True)

    class FixedDelta(backbones.ResNet34Backbone):
        def __call__(self, data, train=False):
            return {'delta_hat_12': jnp.asarray(d12)}

    head = HeadConfig(
        name='PerceptualHead', patch_size=PS,
        patch_keys=('patch_1', 'patch_2'),
        delta_hat_keys=('delta_hat_12',), pf_keys=(),
        auxiliary_resnet='resnet34', auxiliary_resnet_output_layer=1,
        with_projection_head=((64, 32), (32, 8)),
        triplet_loss='one-line', triplet_margin=0.5,
        triplet_aggregation='channel-aware', triplet_distance='l1')
    model = AssembledModel(backbone=FixedDelta(), head=head)
    batch = {'patch_1': jnp.asarray(p1), 'patch_2': jnp.asarray(p2)}
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    variables = torch_port.graft(variables, ported, ('auxiliary_resnet',))
    for i, lin in enumerate((lin0, lin1)):
        variables = torch_port.graft(
            variables,
            {'params': {'kernel': lin.weight.detach().numpy().T,
                        'bias': lin.bias.detach().numpy()}},
            (f'projection_{i}',))
    assert _no_abstract_leaves(variables), 'port did not cover all leaves'

    got = float(model.apply(variables, batch)['loss'])
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-2)


@pytest.mark.parametrize('scale,triplet_loss,margin', [
    (2, 'double-line', 'inf'),
    (4, 'one-line', 0.5),
])
def test_bihome_upsample_patch_value_parity(aux_torch, scale, triplet_loss,
                                            margin):
    """SAMPLING_STRATEGY='upsample-patch-{2,4}x' (ref: PerceptualHead.py:
    317-318,353-377): bilinear align_corners=True upsample before the
    extractor; mask downsample factor follows the feature resolution.

    NOTE the reference's 4x DOUBLE-line path is broken (if/if-else instead
    of if/elif at :392-398 overwrites patch_2_f_prime with non-upsampled
    features -> runtime shape error); 4x is therefore pinned through
    one-line, 2x through double-line (the working combinations)."""
    extract, ported = aux_torch
    p1, p2, d12, d21, _, _ = _inputs(22, with_masks=False)
    doubleline = 'double-line' in triplet_loss

    def nchw(x):
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    want, _ = loss_oracle.bihome_loss(
        extract, nchw(p1), nchw(p2), d12, d21 if doubleline else None,
        triplet_loss=triplet_loss, triplet_margin=margin,
        triplet_aggregation='channel-aware', triplet_distance='l1',
        triplet_mu=0.01, upsample_scale=scale)

    class FixedDelta(backbones.ResNet34Backbone):
        def __call__(self, data, train=False):
            out = {'delta_hat_12': jnp.asarray(d12)}
            if doubleline:
                out['delta_hat_21'] = jnp.asarray(d21)
            return out

    head = HeadConfig(
        name='PerceptualHead', patch_size=PS,
        patch_keys=('patch_1', 'patch_2'),
        delta_hat_keys=(('delta_hat_12', 'delta_hat_21') if doubleline
                        else ('delta_hat_12',)),
        pf_keys=(), auxiliary_resnet='resnet34',
        auxiliary_resnet_output_layer=1,
        triplet_loss=triplet_loss, triplet_margin=margin,
        triplet_aggregation='channel-aware', triplet_distance='l1',
        triplet_mu=0.01, sampling_strategy=f'upsample-patch-{scale}x')
    model = AssembledModel(backbone=FixedDelta(), head=head)
    batch = {'patch_1': jnp.asarray(p1), 'patch_2': jnp.asarray(p2)}
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    variables = torch_port.graft(variables, ported, ('auxiliary_resnet',))
    assert _no_abstract_leaves(variables), 'port did not cover all leaves'

    got = float(model.apply(variables, batch)['loss'])
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-2)


def test_bihome_dual_variant_value_parity(aux_torch):
    """'dual' triplet variant (ref: PerceptualHead.py:407-441): adds the
    backbone's OWN feature-space triplet (full-resolution masks, no hinge)
    on top of the frozen-extractor loss. Requires a ContentAware backbone
    (backbone.feature_extractor)."""
    extract, ported = aux_torch
    p1, p2, d12, d21, _, _ = _inputs(23, with_masks=False)

    torch.manual_seed(9)
    feat_t = ca_oracle.FeatureExtractorTorch()
    with torch.no_grad():
        ca_oracle.randomize_bn_stats(feat_t, np.random.RandomState(13))
    feat_t.eval()

    def nchw(x):
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    def dual_extract(x):
        with torch.no_grad():
            return feat_t(x)

    want, parts = loss_oracle.bihome_loss(
        extract, nchw(p1), nchw(p2), d12, d21,
        triplet_loss='double-line-dual', triplet_margin='inf',
        triplet_aggregation='channel-aware', triplet_distance='l1',
        triplet_mu=0.01, dual_extractor=dual_extract)
    assert parts['dual'] != 0.0

    class FixedDeltaCA(backbones.ContentAwareBackbone):
        def __call__(self, data, train=False):
            return {'delta_hat_12': jnp.asarray(d12),
                    'delta_hat_21': jnp.asarray(d21)}

    head = HeadConfig(
        name='PerceptualHead', patch_size=PS,
        patch_keys=('patch_1', 'patch_2'),
        delta_hat_keys=('delta_hat_12', 'delta_hat_21'), pf_keys=(),
        auxiliary_resnet='resnet34', auxiliary_resnet_output_layer=1,
        triplet_loss='double-line-dual', triplet_margin='inf',
        triplet_aggregation='channel-aware', triplet_distance='l1',
        triplet_mu=0.01)
    model = AssembledModel(backbone=FixedDeltaCA(), head=head)
    batch = {'patch_1': jnp.asarray(p1), 'patch_2': jnp.asarray(p2)}
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    variables = torch_port.graft(variables, ported, ('auxiliary_resnet',))
    sd_fe = {f'feature_extractor.{k}': v
             for k, v in _state_np(feat_t).items()}
    variables = torch_port.graft(variables,
                                 torch_port.port_content_aware(sd_fe),
                                 ('backbone',))
    assert _no_abstract_leaves(variables), 'port did not cover all leaves'

    got = float(model.apply(variables, batch)['loss'])
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-2)
