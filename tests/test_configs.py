"""Every shipped config must parse, build, and match reference semantics."""

import glob
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bihome_tpu import config as config_lib

CONFIGS = sorted(glob.glob('config/*/*.yaml'))
# Configs mirroring the reference tree (json-diff-identical); the
# clevr-change config is a framework example (the reference ships the CLEVR
# flow but no config for it).
REF_CONFIGS = [p for p in CONFIGS if '-coco/' in p]


def test_all_14_reference_configs_present():
    assert len(REF_CONFIGS) == 14


@pytest.mark.parametrize('path', CONFIGS)
def test_config_builds(path):
    config = config_lib.load_config(path)
    built = config_lib.build_model(config)
    assert built.loss_name == config['SOLVER']['LOSS']
    if 'clevr' in path:
        # Real-pair flow: ChangeAwarePrep instead of HomographyNetPrep.
        assert built.pair_spec.change_aware_keys == ('patch_1', 'patch_2')
        return
    assert built.pair_spec.rho == 32
    assert built.pair_spec.patch_size == 128
    # PDS configs distort, S-COCO configs do not.
    if 'pds-coco' in path:
        assert built.pair_spec.max_delta == 32.0
    else:
        assert built.pair_spec.max_delta == 0.0
    kwargs = config_lib.solver_kwargs(config)
    assert kwargs['milestones'] == [30000, 60000, 90000]
    # PhotometricHead consumes the full image_1.
    if config['MODEL']['HEAD']['NAME'] == 'PhotometricHead':
        assert 'image_1' in built.pair_spec.emit_images


def test_semantics_match_reference_tree():
    import os
    import yaml
    if not os.path.isdir('/root/reference/config'):
        pytest.skip('reference tree not mounted')
    for path in REF_CONFIGS:
        ours = yaml.full_load(open(path))
        ref = yaml.full_load(open('/root/reference/' + path))
        assert json.dumps(ours, sort_keys=True) == json.dumps(
            ref, sort_keys=True), path


@pytest.mark.slow
def test_tiny_end_to_end_per_head_family(tmp_path):
    """One fused train step per head family on 16px patches (CPU)."""
    import dataclasses
    from bihome_tpu.data import synthetic
    from bihome_tpu.training import trainer as trainer_lib
    from bihome_tpu.training import train_state as ts_lib

    family_configs = [
        'config/s-coco/detone-orig-lr-5e-3.yaml',
        'config/s-coco/nguyen-orig-lr-5e-3.yaml',
        'config/s-coco/zeng-orig-lr-1e-3.yaml',
        'config/s-coco/zhang-orig-lr-1e-2.yaml',
        'config/s-coco/zhang-bihome-lr-1e-2.yaml',
    ]
    imgs = synthetic.make_image_pool(2, 48, 64, seed=0)
    for path in family_configs:
        config = config_lib.load_config(path)
        built = config_lib.build_model(config)
        built.pair_spec = dataclasses.replace(built.pair_spec, rho=4,
                                              patch_size=16)
        built.head_cfg = dataclasses.replace(built.head_cfg, patch_size=16)
        built.model = dataclasses.replace(built.model, head=built.head_cfg)
        tx, schedule = ts_lib.make_optimizer(
            **config_lib.solver_kwargs(config))
        variables = trainer_lib.init_model(built, imgs)
        state = ts_lib.create_train_state(variables, tx)
        step = jax.jit(trainer_lib.make_train_step(built, tx, schedule))
        state, metrics = step(state, jnp.asarray(imgs),
                              jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss/train'])), path


def test_apply_overrides_types_and_nesting():
    config = {'SOLVER': {'LR': 0.005}, 'MODEL': {'HEAD': {}}}
    config_lib.apply_overrides(config, [
        'SOLVER.LR=1e-4',
        'MODEL.HEAD.AUXILIARY_RESNET_PATH=aux.npz',
        'MODEL.HEAD.NEW.FLAG=true',
    ])
    assert config['SOLVER']['LR'] == 1e-4
    assert config['MODEL']['HEAD']['AUXILIARY_RESNET_PATH'] == 'aux.npz'
    assert config['MODEL']['HEAD']['NEW']['FLAG'] is True
    import pytest as _pytest
    with _pytest.raises(ValueError):
        config_lib.apply_overrides(config, ['NO_EQUALS'])
