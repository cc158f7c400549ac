"""Full reference-checkpoint import: architecture parity vs torch oracles.

Proves a complete trained reference checkpoint (nn.Sequential(backbone,
head) state_dict, ref: src/utils/checkpoint.py:40-48) loads into the flax
model and reproduces the torch forward — decoder deconvs, PF head, and
ContentAware subnets included (the round-1 gap: only the encoder remap was
ported).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from bihome_tpu.models import backbones, torch_port  # noqa: E402
from tests import torch_rethinking_oracle as oracle  # noqa: E402

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m "not slow"


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestRethinkingFullPort:

    def test_pf_output_parity(self):
        rng = np.random.RandomState(0)
        net = oracle.RethinkingTorch()
        with torch.no_grad():
            oracle.randomize_bn_stats(net, rng)
        net.eval()

        x = rng.randn(2, 2, 32, 32).astype(np.float32)
        with torch.no_grad():
            want = net(torch.tensor(x)).numpy()                # [2,2,32,32]

        backbone = backbones.RethinkingBackbone(
            patch_keys=('patch_1', 'patch_2'),
            target_keys=('pf_hat_12',), variant='oneline')
        data = {'patch_1': jnp.asarray(x[:, 0:1].transpose(0, 2, 3, 1)),
                'patch_2': jnp.asarray(x[:, 1:2].transpose(0, 2, 3, 1))}
        variables = backbone.init(jax.random.PRNGKey(0), data)
        ported = torch_port.port_rethinking_full(_state_np(net))
        variables = torch_port.graft(variables, ported)
        got = backbone.apply(variables, data, train=False)['pf_hat_12']
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))

        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_all_params_covered(self):
        """Every param/stat leaf of the flax Rethinking tree is written by
        the port (no silently-missing mapping)."""
        net = oracle.RethinkingTorch()
        ported = torch_port.port_rethinking_full(_state_np(net))

        backbone = backbones.RethinkingBackbone(
            patch_keys=('patch_1', 'patch_2'), target_keys=('pf_hat_12',))
        data = {'patch_1': jnp.zeros((1, 32, 32, 1)),
                'patch_2': jnp.zeros((1, 32, 32, 1))}
        variables = jax.eval_shape(
            lambda: backbone.init(jax.random.PRNGKey(0), data))

        def leaf_paths(tree, prefix=()):
            out = set()
            for k, v in tree.items():
                if isinstance(v, dict):
                    out |= leaf_paths(v, prefix + (k,))
                else:
                    out.add(prefix + (k,))
            return out

        for coll in ('params', 'batch_stats'):
            missing = leaf_paths(variables[coll]) - leaf_paths(ported[coll])
            assert not missing, f'{coll} leaves not ported: {missing}'


class TestContentAwarePort:

    def test_subnet_parity(self):
        rng = np.random.RandomState(1)
        mask_t = oracle.MaskPredictorTorch()
        feat_t = oracle.FeatureExtractorTorch()
        with torch.no_grad():
            oracle.randomize_bn_stats(mask_t, rng)
            oracle.randomize_bn_stats(feat_t, rng)
        mask_t.eval()
        feat_t.eval()

        x = rng.randn(2, 1, 16, 16).astype(np.float32)
        with torch.no_grad():
            want_m = mask_t(torch.tensor(x)).numpy()
            want_f = feat_t(torch.tensor(x)).numpy()

        sd = {}
        for prefix, mod in (('mask_predictor', mask_t),
                            ('feature_extractor', feat_t)):
            for k, v in _state_np(mod).items():
                sd[f'{prefix}.{k}'] = v
        # resnet34 regressor: covered by the torchvision-resnet port tests;
        # here only the CA-specific subnets need fresh parity.
        ported = torch_port.port_content_aware(sd)

        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        mp = backbones.MaskPredictor()
        vm = mp.init(jax.random.PRNGKey(0), xj)
        vm = torch_port.graft(vm, {
            'params': ported['params']['mask_predictor'],
            'batch_stats': ported['batch_stats']['mask_predictor']})
        got_m = np.transpose(np.asarray(
            mp.apply(vm, xj, train=False)), (0, 3, 1, 2))
        np.testing.assert_allclose(got_m, want_m, atol=1e-5, rtol=1e-4)

        fe = backbones.FeatureExtractor()
        vf = fe.init(jax.random.PRNGKey(0), xj)
        vf = torch_port.graft(vf, {
            'params': ported['params']['feature_extractor'],
            'batch_stats': ported['batch_stats']['feature_extractor']})
        got_f = np.transpose(np.asarray(
            fe.apply(vf, xj, train=False)), (0, 3, 1, 2))
        np.testing.assert_allclose(got_f, want_f, atol=1e-5, rtol=1e-4)


class TestFullCheckpointEndToEnd:

    def test_zeng_checkpoint_shapes_and_step(self):
        """A synthetic full reference checkpoint (Rethinking backbone +
        PerceptualHead aux resnet) ports into the assembled zeng model:
        every backbone/aux leaf lands with the right shape, step restored."""
        from tests.torch_resnet_oracle import ResNet34

        net = oracle.RethinkingTorch()
        aux = ResNet34(num_classes=1000, in_channels=3)
        sd = {}
        for k, v in _state_np(net).items():
            sd[f'0.{k}'] = v
        for k, v in _state_np(aux).items():
            if k.startswith(('layer2', 'layer3', 'layer4', 'fc')):
                continue                   # truncated at layer1 (output_layer=1)
            sd[f'1.resnet.{k}'] = v
        data = {'model': sd, 'step': 12345}

        from bihome_tpu import config as config_lib
        config = config_lib.load_config(
            'config/pds-coco/zeng-bihome-lr-1e-3.yaml')
        built = config_lib.build_model(config)

        from bihome_tpu.data import pipeline, synthetic
        import dataclasses
        images = jnp.asarray(synthetic.make_image_pool(2, 160, 160, seed=0))
        spec = dataclasses.replace(built.pair_spec, patch_size=32, rho=8)
        batch = pipeline.generate_pairs(images, jax.random.PRNGKey(0), spec)
        variables = jax.eval_shape(
            lambda: built.model.init(
                {'params': jax.random.PRNGKey(0),
                 'dsac': jax.random.PRNGKey(1)}, batch))

        out_vars, step = torch_port.port_reference_checkpoint(
            data, config, variables)
        assert step == 12345
        k = out_vars['params']['backbone']['layer1_conv']['kernel']
        assert isinstance(k, np.ndarray) and k.shape == (7, 7, 2, 64)
        # aux stem: grayscale input -> RGB kernel summed to 1 channel
        ka = out_vars['params']['auxiliary_resnet']['conv1']['kernel']
        assert isinstance(ka, np.ndarray) and ka.shape[2] in (1, 3)
        km = out_vars['batch_stats']['backbone']['layer8']['bn_mean']
        assert isinstance(km, np.ndarray) and km.shape == (128,)
