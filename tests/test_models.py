"""Model parity tests: flax modules vs torch oracles (SURVEY §7 hard part 2).

torchvision is NOT installed here, so tests/torch_resnet_oracle.py provides a
minimal torch ResNet34 with torchvision-compatible state_dict keys; random
weights are ported through models.torch_port and outputs compared numerically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bihome_tpu.models import backbones, resnet, torch_port

torch = pytest.importorskip('torch')


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


class TestTorchParity:
    def test_resnet34_logits_match_torch_oracle(self):
        from tests.torch_resnet_oracle import ResNet34
        torch.manual_seed(0)
        tmodel = ResNet34(num_classes=8)
        tmodel.eval()
        x = torch.randn(2, 3, 64, 64)
        with torch.no_grad():
            want = tmodel(x).numpy()

        fmodel = resnet.ResNet(arch='resnet34', num_classes=8)
        variables = fmodel.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)))
        state = {k: np.asarray(v.detach().numpy())
                 for k, v in tmodel.state_dict().items()}
        ported = torch_port.port_torchvision_resnet(state)
        variables = torch_port.graft(variables, ported)
        got = np.asarray(fmodel.apply(variables,
                                      jnp.array(to_nhwc(x.numpy()))))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_conv_transpose_mapping(self):
        torch.manual_seed(1)
        tconv = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2,
                                         bias=True)
        x = torch.randn(2, 6, 8, 8)
        with torch.no_grad():
            want = tconv(x).numpy()

        from flax import linen as nn
        fconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding='VALID',
                                 use_bias=True, transpose_kernel=True)
        variables = fconv.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 6)))
        kernel = torch_port.conv_transpose_kernel(
            tconv.weight.detach().numpy())
        assert variables['params']['kernel'].shape == kernel.shape, (
            variables['params']['kernel'].shape, kernel.shape)
        variables = {'params': {'kernel': jnp.array(kernel),
                                'bias': jnp.array(
                                    tconv.bias.detach().numpy())}}
        got = np.asarray(fconv.apply(variables,
                                     jnp.array(to_nhwc(x.numpy()))))
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-4)

    def test_maxpool_3x3_s2_p1_matches_torch(self):
        x = torch.randn(1, 4, 9, 9)
        want = torch.nn.MaxPool2d(3, stride=2, padding=1)(x).numpy()
        from flax import linen as nn
        got = np.asarray(nn.max_pool(jnp.array(to_nhwc(x.numpy())),
                                     (3, 3), strides=(2, 2),
                                     padding=((1, 1), (1, 1))))
        np.testing.assert_allclose(got, to_nhwc(want), atol=1e-6)

    def test_aux_resnet_truncation_matches_torch_layer1(self):
        from tests.torch_resnet_oracle import ResNet34
        torch.manual_seed(2)
        tmodel = ResNet34()
        tmodel.eval()
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            want = tmodel.forward_features_layer1(x).numpy()

        fmodel = resnet.ResNet(arch='resnet34', output_layer=1)
        variables = fmodel.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)))
        state = {k: np.asarray(v.detach().numpy())
                 for k, v in tmodel.state_dict().items()}
        variables = torch_port.graft(
            variables, torch_port.port_torchvision_resnet(state,
                                                          include_fc=False))
        got = np.asarray(fmodel.apply(variables,
                                      jnp.array(to_nhwc(x.numpy()))))
        assert got.shape == to_nhwc(want).shape  # [1,16,16,64]
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-3, atol=1e-3)


def small_batch(batch=2, ps=32):
    rs = np.random.RandomState(0)
    return {
        'patch_1': jnp.array(rs.randn(batch, ps, ps, 1), jnp.float32),
        'patch_2': jnp.array(rs.randn(batch, ps, ps, 1), jnp.float32),
    }


class TestBackbones:
    def test_resnet34_backbone_doubleline(self):
        m = backbones.ResNet34Backbone(
            variant='doubleline',
            target_keys=('delta_hat_12', 'delta_hat_21'))
        data = small_batch()
        variables = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(variables, data)
        assert out['delta_hat_12'].shape == (2, 4, 2)
        assert out['delta_hat_21'].shape == (2, 4, 2)
        # Swapping patches must swap the two outputs (weight sharing).
        swapped = {'patch_1': data['patch_2'], 'patch_2': data['patch_1']}
        out_sw = m.apply(variables, swapped)
        np.testing.assert_allclose(np.asarray(out['delta_hat_12']),
                                   np.asarray(out_sw['delta_hat_21']),
                                   rtol=2e-4, atol=2e-4)

    def test_rethinking_shapes_and_imagenet_port(self):
        from tests.torch_resnet_oracle import ResNet34
        m = backbones.RethinkingBackbone(
            variant='doubleline', target_keys=('pf_hat_12', 'pf_hat_21'))
        data = small_batch(ps=32)
        variables = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(variables, data)
        assert out['pf_hat_12'].shape == (2, 32, 32, 2)
        assert out['pf_hat_21'].shape == (2, 32, 32, 2)
        # Encoder ImageNet remap loads without shape mismatches.
        tmodel = ResNet34()
        state = {k: np.asarray(v.detach().numpy())
                 for k, v in tmodel.state_dict().items()}
        ported = torch_port.port_rethinking_encoder(state)
        variables2 = torch_port.graft(variables, ported)
        out2 = m.apply(variables2, data)
        assert out2['pf_hat_12'].shape == (2, 32, 32, 2)
        assert not np.allclose(np.asarray(out2['pf_hat_12']),
                               np.asarray(out['pf_hat_12']))

    def test_content_aware(self):
        m = backbones.ContentAwareBackbone(
            variant='doubleline',
            target_keys=('delta_hat_12', 'delta_hat_21'))
        data = small_batch()
        variables = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(variables, data)
        for k in ('mask_1', 'mask_2', 'feature_1', 'feature_2'):
            assert out[k].shape == (2, 32, 32, 1)
        mask = np.asarray(out['mask_1'])
        assert mask.min() >= 0.0 and mask.max() <= 1.0
        assert out['delta_hat_12'].shape == (2, 4, 2)

    def test_content_aware_fix_mask(self):
        m = backbones.ContentAwareBackbone(variant='oneline', fix_mask=True)
        data = small_batch()
        variables = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(variables, data)
        np.testing.assert_array_equal(np.asarray(out['mask_1']), 1.0)

    def test_homography_net(self):
        m = backbones.HomographyNetBackbone(image_size=128)
        data = small_batch(ps=128)
        variables = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(variables, data)
        assert out['delta_hat_12'].shape == (2, 4, 2)

    def test_build_backbone_from_yaml_section(self):
        cfg = {'NAME': 'Rethinking', 'VARIANT': 'DoubleLine',
               'IMAGE_SIZE': 128, 'RESNET_BLOCK': 'ResNet34',
               'PRETRAINED_RESNET': False, 'IMAGE_KEY': ['image'],
               'PATCH_KEYS': ['patch_1', 'patch_2'],
               'TARGET_KEYS': ['pf_hat_12', 'pf_hat_21']}
        m = backbones.build_backbone(cfg)
        assert isinstance(m, backbones.RethinkingBackbone)
        assert m.variant == 'doubleline'
