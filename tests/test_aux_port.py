"""aux-extractor npz -> model integration (tools/pretrain_aux.py output).

The flagship demos stand on this path: pretrain_aux saves conv1/bn1/layer1
as a flat .npz (utils/aux_store.py) and train.py grafts it into the
assembled model's frozen auxiliary_resnet
(train.py:maybe_load_pretrained_resnets). Lock the name mapping and the
round trip — a silent key mismatch would leave the extractor at random
init and the biHomE loss meaningless (ref premise:
src/heads/PerceptualHead.py:21-39).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bihome_tpu import config as config_lib
from bihome_tpu.models.resnet import ResNet
from bihome_tpu.utils import aux_store

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, 'config/s-coco/zeng-bihome-lr-1e-3.yaml')


def test_aux_npz_round_trip_and_graft(tmp_path):
    # Save: the pretext model (full resnet34 truncated at layer1).
    model = ResNet(arch='resnet34', num_classes=4, output_layer=1)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 32, 32, 1)), train=False)
    # Distinctive marker values so a graft miss is unmistakable.
    marked = jax.tree.map(lambda x: jnp.full_like(x, 0.125),
                          variables['params'])
    path = str(tmp_path / 'aux.npz')
    aux_store.save_aux_npz(path, {'params': marked,
                                  'batch_stats': variables['batch_stats']})

    loaded = aux_store.load_aux_npz(path)
    # Only the conv1/bn1/layer1 subtree is stored...
    assert 'conv1' in loaded['params'] and 'bn1' in loaded['params']
    assert all(k.startswith(('conv1', 'bn1', 'layer1_'))
               for k in loaded['params'])
    np.testing.assert_array_equal(
        loaded['params']['conv1']['kernel'],
        np.full_like(np.asarray(variables['params']['conv1']['kernel']),
                     0.125))

    # Graft: into the assembled flagship model's frozen auxiliary_resnet.
    import train as train_cli
    config = config_lib.load_config(CONFIG)
    config_lib.apply_overrides(config, [
        f'MODEL.HEAD.AUXILIARY_RESNET_PATH={path}'])
    built = config_lib.build_model(config)
    from bihome_tpu.data import datasets
    from bihome_tpu.training import trainer as trainer_lib
    ds = datasets.SyntheticDataset(image_size=(320, 240), seed=2)
    model_vars = trainer_lib.init_model(built, np.stack([ds.load_image(0)]))
    before = np.asarray(
        model_vars['params']['auxiliary_resnet']['conv1']['kernel']).copy()
    model_vars = train_cli.maybe_load_pretrained_resnets(
        built, model_vars, config)
    after = np.asarray(
        model_vars['params']['auxiliary_resnet']['conv1']['kernel'])
    assert not np.allclose(before, after)
    np.testing.assert_array_equal(after, np.full_like(after, 0.125))
    # layer1 block weights land too (not just the stem).
    l1 = model_vars['params']['auxiliary_resnet']
    block_keys = [k for k in l1 if k.startswith('layer1_')]
    assert block_keys, list(l1)
    conv_k = np.asarray(l1[block_keys[0]]['conv1']['kernel'])
    np.testing.assert_array_equal(conv_k, np.full_like(conv_k, 0.125))


def test_aux_npz_layer2_graft_and_prune(tmp_path):
    """--layers 2 extractor npz (tools/pretrain_aux.py): layer2 weights land
    when the flagship runs at AUXILIARY_RESNET_OUTPUT_LAYER=2, and the SAME
    npz grafts into the default OUTPUT_LAYER=1 model by pruning the layer2
    subtree (aux_store.prune_to_template) instead of inserting params flax
    would reject."""
    import train as train_cli
    from bihome_tpu.data import datasets
    from bihome_tpu.training import trainer as trainer_lib

    model = ResNet(arch='resnet34', num_classes=4, output_layer=2)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 32, 32, 1)), train=False)
    marked = jax.tree.map(lambda x: jnp.full_like(x, 0.25),
                          variables['params'])
    path = str(tmp_path / 'aux_l2.npz')
    aux_store.save_aux_npz(path, {'params': marked,
                                  'batch_stats': variables['batch_stats']})
    loaded = aux_store.load_aux_npz(path)
    assert any(k.startswith('layer2_') for k in loaded['params'])

    ds = datasets.SyntheticDataset(image_size=(320, 240), seed=2)
    image = np.stack([ds.load_image(0)])

    # Deep model: layer2 weights must land.
    config = config_lib.load_config(CONFIG)
    config_lib.apply_overrides(config, [
        'MODEL.HEAD.AUXILIARY_RESNET_OUTPUT_LAYER=2',
        f'MODEL.HEAD.AUXILIARY_RESNET_PATH={path}'])
    built = config_lib.build_model(config)
    model_vars = trainer_lib.init_model(built, image)
    model_vars = train_cli.maybe_load_pretrained_resnets(
        built, model_vars, config)
    aux = model_vars['params']['auxiliary_resnet']
    l2_keys = [k for k in aux if k.startswith('layer2_')]
    assert l2_keys, list(aux)
    got = np.asarray(aux[l2_keys[0]]['conv1']['kernel'])
    np.testing.assert_array_equal(got, np.full_like(got, 0.25))

    # Shallow (default OUTPUT_LAYER=1) model: graft prunes, does not crash,
    # and the shared conv1/bn1/layer1 weights still land.
    config1 = config_lib.load_config(CONFIG)
    config_lib.apply_overrides(config1, [
        f'MODEL.HEAD.AUXILIARY_RESNET_PATH={path}'])
    built1 = config_lib.build_model(config1)
    vars1 = trainer_lib.init_model(built1, image)
    vars1 = train_cli.maybe_load_pretrained_resnets(built1, vars1, config1)
    aux1 = vars1['params']['auxiliary_resnet']
    assert not any(k.startswith('layer2_') for k in aux1)
    got1 = np.asarray(aux1['conv1']['kernel'])
    np.testing.assert_array_equal(got1, np.full_like(got1, 0.25))


def test_prune_to_template_unit():
    tree = {'params': {'conv1': {'kernel': np.ones((3,))},
                       'layer2_0': {'conv1': {'kernel': np.ones((2,))}}}}
    tmpl = {'params': {'conv1': {'kernel': np.zeros((3,))}}}
    pruned, dropped = aux_store.prune_to_template(tree, tmpl)
    assert dropped == ['params/layer2_0']
    assert 'layer2_0' not in pruned['params']
    np.testing.assert_array_equal(pruned['params']['conv1']['kernel'],
                                  np.ones((3,)))


def test_score_cnn_pretrained_graft(tmp_path):
    """SCORE_CNN_PRETRAINED weight path (ref: src/heads/ransac_utils.py:10-23).

    The reference loads torchvision resnet18 ImageNet weights into the DSAC
    ScoreCNN, then REPLACES conv1 (2-ch stem) and fc (1 unit) — so pretrained
    weights must land on every layer EXCEPT those two. No-egress analog:
    MODEL.HEAD.SCORE_CNN_PATH names a local .pth
    (train.py:maybe_load_pretrained_resnets)."""
    import torch
    import train as train_cli
    from bihome_tpu.data import datasets
    from bihome_tpu.models import torch_port
    from bihome_tpu.training import trainer as trainer_lib
    from tests.torch_resnet_oracle import ResNet18

    torch.manual_seed(7)
    tmodel = ResNet18(num_classes=1000, in_channels=3)
    pth = str(tmp_path / 'resnet18.pth')
    torch.save(tmodel.state_dict(), pth)

    config = config_lib.load_config(CONFIG)
    config_lib.apply_overrides(config, [
        'MODEL.HEAD.SCORING_METHOD=score_cnn',
        'MODEL.HEAD.SCORE_CNN_PRETRAINED=true',
        f'MODEL.HEAD.SCORE_CNN_PATH={pth}'])
    built = config_lib.build_model(config)
    ds = datasets.SyntheticDataset(image_size=(320, 240), seed=2)
    model_vars = trainer_lib.init_model(built, np.stack([ds.load_image(0)]))
    assert 'score_cnn' in model_vars['params']
    sc = model_vars['params']['score_cnn']
    before_l1 = np.asarray(sc['layer1_0']['conv1']['kernel']).copy()
    before_stem = np.asarray(sc['conv1']['kernel']).copy()
    before_fc = np.asarray(sc['fc']['kernel']).copy()

    model_vars = train_cli.maybe_load_pretrained_resnets(
        built, model_vars, config)
    sc = model_vars['params']['score_cnn']
    want = torch_port.conv_kernel(
        tmodel.state_dict()['layer1.0.conv1.weight'].numpy())
    np.testing.assert_allclose(
        np.asarray(sc['layer1_0']['conv1']['kernel']), want, rtol=1e-6)
    assert not np.allclose(before_l1, want)
    # Replaced-after-load layers stay at init (2-ch stem, 1-unit fc).
    np.testing.assert_array_equal(np.asarray(sc['conv1']['kernel']),
                                  before_stem)
    np.testing.assert_array_equal(np.asarray(sc['fc']['kernel']), before_fc)
    # BN running stats land too.
    stats = model_vars['batch_stats']['score_cnn']
    np.testing.assert_allclose(
        np.asarray(stats['layer1_0']['bn1']['var']),
        tmodel.state_dict()['layer1.0.bn1.running_var'].numpy(), rtol=1e-6)
