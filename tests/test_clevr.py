"""CLEVR-Change real-pair flow: loader + ChangeAwarePrep + one train step
(the round-1 gap: epoch_pairs() had no consumer and pairs never reached a
model). ref: src/data/clevr_change/dataset.py:90-152, transforms.py:399-418.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from bihome_tpu import config as config_lib
from bihome_tpu.data import clevr_change, pipeline
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib

CONFIG = 'config/clevr-change/zhang-clevr-nsc-lr-1e-2.yaml'


def _make_clevr_tree(tmp_path, n=3, hw=(12, 16)):
    from PIL import Image
    rng = np.random.RandomState(0)
    for sub in ('images', 'nsc_images', 'sc_images'):
        d = tmp_path / sub
        d.mkdir()
        for i in range(n):
            arr = rng.randint(0, 255, size=hw + (3,), dtype=np.uint8)
            Image.fromarray(arr).save(d / f'img_{i:03d}.png')
    return str(tmp_path)


class TestPairLoader:

    def test_epoch_pairs_consumed_and_shapes(self, tmp_path):
        root = _make_clevr_tree(tmp_path)
        ds = clevr_change.ClevrChangeDataset(root, image_size=(16, 12))
        loader = clevr_change.ClevrPairLoader(ds, batch_size=2,
                                              samples_per_epoch=4,
                                              mode='nsc', random_seed=7)
        batches = list(loader.epoch())
        assert len(batches) == 2
        assert batches[0].shape == (2, 2, 12, 16, 3)
        # nsc pairing: patch_2 comes from the nsc section (idx + N).
        pairs = clevr_change.ClevrChangePairSampler(
            ds, 2, 4, mode='nsc', random_seed=7).epoch_pairs()
        assert np.all(pairs[:, 1] == pairs[:, 0] + len(ds))
        pool = loader.pool(5)
        assert pool.shape == (5, 2, 12, 16, 3)

    def test_sc_and_both_modes(self, tmp_path):
        root = _make_clevr_tree(tmp_path)
        ds = clevr_change.ClevrChangeDataset(root, image_size=(16, 12))
        sc = clevr_change.ClevrChangePairSampler(
            ds, 1, 8, mode='sc', random_seed=0).epoch_pairs()
        assert np.all(sc[:, 1] == sc[:, 0] + 2 * len(ds))
        both = clevr_change.ClevrChangePairSampler(
            ds, 1, 64, mode='both', random_seed=0).epoch_pairs()
        offs = (both[:, 1] - both[:, 0]) // len(ds)
        assert set(offs.tolist()) == {1, 2}


class TestChangeAwareTraining:

    def test_triplet_head_trains_one_step_on_pairs(self):
        config = config_lib.load_config(CONFIG)
        built = config_lib.build_model(config)
        spec = built.pair_spec
        assert spec.change_aware_keys == ('patch_1', 'patch_2')

        ds = clevr_change.SyntheticChangeDataset(num_images=8,
                                                 image_size=(32, 32), seed=0)
        loader = clevr_change.ClevrPairLoader(ds, batch_size=2,
                                              samples_per_epoch=2,
                                              mode='nsc', random_seed=1)
        (pairs,) = list(loader.epoch())                  # [2,2,32,32,3]

        batch = pipeline.generate_pairs(jnp.asarray(pairs),
                                        jax.random.PRNGKey(0), spec)
        assert set(batch) == {'patch_1', 'patch_2'}
        assert batch['patch_1'].shape == (2, 32, 32, 1)

        tx, schedule = ts_lib.make_optimizer(
            **config_lib.solver_kwargs(config))
        variables = trainer_lib.init_model(built, pairs)
        state = ts_lib.create_train_state(variables, tx)
        step = jax.jit(trainer_lib.make_train_step(built, tx, schedule))
        state, metrics = step(state, jnp.asarray(pairs),
                              jax.random.PRNGKey(0))
        assert int(state.step) == 1
        assert np.isfinite(float(metrics['loss/train']))
