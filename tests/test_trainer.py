"""Trainer tests: optimizer freeze mask, learning progress, DP-mesh parity,
checkpoint semantics (SURVEY §4e — pjit tests on the fake CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bihome_tpu import config as config_lib
from bihome_tpu.data import pipeline, synthetic
from bihome_tpu.heads import AssembledModel, HeadConfig
from bihome_tpu.models import backbones
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib

PS = 16


def tiny_built(loss_name='MSELoss', bihome=False):
    if bihome:
        backbone = backbones.ResNet34Backbone(
            variant='doubleline',
            target_keys=('delta_hat_12', 'delta_hat_21'))
        head = HeadConfig(name='PerceptualHead', patch_size=PS,
                          delta_hat_keys=('delta_hat_12', 'delta_hat_21'),
                          triplet_loss='double-line',
                          triplet_aggregation='channel-agnostic',
                          triplet_margin='inf', triplet_distance='l1',
                          triplet_mu=0.01)
        loss_name = 'biHomE'
    else:
        backbone = backbones.ResNet34Backbone(variant='oneline')
        head = HeadConfig(name='NoOpHead', target_gen='4_points',
                          learning_keys=('delta', 'delta_hat_12', 'delta',
                                         'delta_hat_12'), patch_size=PS)
    spec = pipeline.PairSpec(rho=4, patch_size=PS, photometric_keys=(),
                             max_delta=0.0)
    model = AssembledModel(backbone=backbone, head=head)
    return config_lib.BuiltModel(model=model, head_cfg=head, pair_spec=spec,
                                 test_pair_spec=spec, loss_name=loss_name,
                                 config={})


def images(batch=8, seed=0):
    return jnp.asarray(synthetic.make_image_pool(batch, 40, 48, seed=seed))


class TestOptimizer:
    @pytest.mark.slow
    def test_frozen_aux_resnet_not_updated(self):
        built = tiny_built(bihome=True)
        imgs = np.asarray(images(2))
        variables = trainer_lib.init_model(built, imgs)
        tx, schedule = ts_lib.make_optimizer(lr=1e-2, milestones=[100],
                                             decay=0.1)
        state = ts_lib.create_train_state(variables, tx)
        step = trainer_lib.make_train_step(built, tx, schedule)
        new_state, metrics = jax.jit(step)(state, jnp.asarray(imgs),
                                           jax.random.PRNGKey(0))
        aux_before = jax.tree_util.tree_leaves(
            state.params['auxiliary_resnet'])
        aux_after = jax.tree_util.tree_leaves(
            new_state.params['auxiliary_resnet'])
        for a, b in zip(aux_before, aux_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        bb_before = jax.tree_util.tree_leaves(state.params['backbone'])
        bb_after = jax.tree_util.tree_leaves(new_state.params['backbone'])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(bb_before, bb_after))
        assert np.isfinite(float(metrics['loss/train']))

    def test_lr_schedule_multistep(self):
        _, schedule = ts_lib.make_optimizer(lr=1.0, milestones=[10, 20],
                                            decay=0.1)
        assert np.isclose(float(schedule(0)), 1.0)
        assert np.isclose(float(schedule(10)), 0.1)
        assert np.isclose(float(schedule(25)), 0.01)

    @pytest.mark.slow
    def test_supervised_loss_decreases(self):
        # rho=2 gives deltas in {-2,-1,0,1} (mean -0.5): learning just the
        # output bias drops MSE from E[d^2]=1.5 toward Var[d]=1.25 within a
        # few dozen Adam steps — a learnable signal despite fresh random
        # pairs each step.
        built = tiny_built()
        object.__setattr__(built.pair_spec, 'rho', 2)
        imgs = np.asarray(images(4))
        variables = trainer_lib.init_model(built, imgs)
        tx, schedule = ts_lib.make_optimizer(lr=2e-2, milestones=[10000],
                                             decay=0.1)
        state = ts_lib.create_train_state(variables, tx)
        step = jax.jit(trainer_lib.make_train_step(built, tx, schedule))
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(30):
            state, metrics = step(state, jnp.asarray(imgs), rng)
            losses.append(float(metrics['loss/train']))
        assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses


@pytest.mark.slow
class TestMeshDP:
    def test_sharded_matches_single_device(self):
        built = tiny_built()
        imgs = np.asarray(images(8))
        variables = trainer_lib.init_model(built, imgs)
        tx, schedule = ts_lib.make_optimizer(lr=1e-3, milestones=[1000],
                                             decay=0.1)
        raw = trainer_lib.make_train_step(built, tx, schedule)

        # Single device.
        state1 = ts_lib.create_train_state(variables, tx)
        state1, m1 = jax.jit(raw)(state1, jnp.asarray(imgs),
                                  jax.random.PRNGKey(7))

        # 8-device DP mesh.
        assert len(jax.devices()) >= 8
        mesh = mesh_lib.make_mesh(jax.devices()[:8])
        stepn = trainer_lib.compile_for_mesh(raw, mesh, donate_state=False)
        state8 = ts_lib.create_train_state(variables, tx)
        state8 = jax.device_put(state8, mesh_lib.replicated_sharding(mesh))
        imgs_sharded = jax.device_put(jnp.asarray(imgs),
                                      mesh_lib.batch_sharding(mesh))
        rng = jax.device_put(jax.random.PRNGKey(7),
                             mesh_lib.replicated_sharding(mesh))
        state8, m8 = stepn(state8, imgs_sharded, rng)

        np.testing.assert_allclose(float(m1['loss/train']),
                                   float(m8['loss/train']),
                                   rtol=1e-4, atol=1e-5)
        # Adam's first-step update is ±lr elementwise; cross-device reduction
        # order can flip the sign of a near-zero gradient, so the principled
        # bound is ~2*lr absolute on isolated elements.
        l1 = jax.tree_util.tree_leaves(state1.params)
        l8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2.5e-3)

    def test_sharded_pool_feed(self):
        """--pool_shard path: pool sharded over 'data', each device samples
        its own shard via shard_map; batch is born sharded, loss finite,
        params update."""
        built = tiny_built()
        imgs = np.asarray(images(8))
        variables = trainer_lib.init_model(built, imgs)
        tx, schedule = ts_lib.make_optimizer(lr=1e-3, milestones=[1000],
                                             decay=0.1)
        assert len(jax.devices()) >= 8
        mesh = mesh_lib.make_mesh(jax.devices()[:8])
        pool_step = jax.jit(trainer_lib.make_pool_train_step(
            built, tx, schedule, num_steps=2, batch_size=8, mesh=mesh))
        state = jax.device_put(ts_lib.create_train_state(variables, tx),
                               mesh_lib.replicated_sharding(mesh))
        pool = jax.device_put(jnp.asarray(np.asarray(images(16, seed=3))),
                              mesh_lib.batch_sharding(mesh))
        rng = jax.device_put(jax.random.PRNGKey(0),
                             mesh_lib.replicated_sharding(mesh))
        new_state, metrics = pool_step(state, pool, rng)
        assert np.isfinite(float(metrics['loss/train']))
        assert int(new_state.step) == 2
        before = jax.tree_util.tree_leaves(jax.device_get(state.params))
        after = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        assert any(not np.allclose(a, b) for a, b in zip(before, after))

    def test_pool_train_step_rejects_indivisible_batch(self):
        built = tiny_built()
        mesh = mesh_lib.make_mesh(jax.devices()[:8])
        tx, schedule = ts_lib.make_optimizer(lr=1e-3, milestones=[1000],
                                             decay=0.1)
        with pytest.raises(ValueError):
            trainer_lib.make_pool_train_step(built, tx, schedule,
                                             num_steps=1, batch_size=6,
                                             mesh=mesh)

    def test_graft_entry_dryrun(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from bihome_tpu.training import checkpoint as ckpt_lib
        built = tiny_built()
        imgs = np.asarray(images(2))
        variables = trainer_lib.init_model(built, imgs)
        tx, _ = ts_lib.make_optimizer(lr=1e-3, milestones=[10], decay=0.1)
        state = ts_lib.create_train_state(variables, tx)
        state = state.replace(step=jnp.asarray(1234, jnp.int32))

        ckptr = ckpt_lib.CheckPointer(str(tmp_path / 'log'))
        ckptr.save(1234, jax.device_get(state))
        template = ts_lib.create_train_state(variables, tx)
        restored, step = ckptr.load(template)
        assert step == 1234
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # RESTART_LEARNING_RATE: optimizer state dropped.
        restored_lr, _ = ckptr.load(template, restart_learning_rate=True)
        assert int(restored_lr.step) == 0
        ckptr.close()

    def test_weights_only_restore_ignores_optimizer_layout(self, tmp_path):
        """eval.py's loader: restores params/batch_stats + step from a
        checkpoint written with a DIFFERENT optimizer configuration (the
        opt_state pytree does not participate at all)."""
        from bihome_tpu.training import checkpoint as ckpt_lib
        built = tiny_built()
        imgs = np.asarray(images(2))
        variables = trainer_lib.init_model(built, imgs)
        tx_clip, _ = ts_lib.make_optimizer(lr=1e-3, milestones=[10],
                                           decay=0.1, gradient_clip=1.0)
        state = ts_lib.create_train_state(variables, tx_clip)
        ckptr = ckpt_lib.CheckPointer(str(tmp_path / 'log'))
        ckptr.save(4200, jax.device_get(state))
        ckptr.close()

        # Template built WITHOUT clip: opt_state layout differs from the
        # checkpoint's; the full restore would reject it.
        tx_plain, _ = ts_lib.make_optimizer(lr=1e-3, milestones=[10],
                                            decay=0.1)
        template = ts_lib.create_train_state(
            trainer_lib.init_model(built, imgs, seed=9), tx_plain)
        restored, step = ckpt_lib.load_weights_only(
            str(tmp_path / 'log'), template)
        assert step == 4200
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_survives_optimizer_layout_change(self, tmp_path):
        """Auto-resume after a SOLVER edit that changes the optax chain
        (e.g. adding/removing GRADIENT_CLIP) falls back to weights+step
        with a fresh optimizer instead of crashing (reference analog:
        clipping is not optimizer state in torch)."""
        from bihome_tpu.training import checkpoint as ckpt_lib
        built = tiny_built()
        imgs = np.asarray(images(2))
        variables = trainer_lib.init_model(built, imgs)
        tx_clip, _ = ts_lib.make_optimizer(lr=1e-3, milestones=[10],
                                           decay=0.1, gradient_clip=1.0)
        state = ts_lib.create_train_state(variables, tx_clip)
        ckptr = ckpt_lib.CheckPointer(str(tmp_path / 'log'))
        ckptr.save(777, jax.device_get(state))
        ckptr.close()

        tx_plain, _ = ts_lib.make_optimizer(lr=1e-3, milestones=[10],
                                            decay=0.1)
        template = ts_lib.create_train_state(
            trainer_lib.init_model(built, imgs, seed=9), tx_plain)
        ckptr2 = ckpt_lib.CheckPointer(str(tmp_path / 'log'))
        restored, step = ckptr2.load(template)
        ckptr2.close()
        assert step == 777 and int(restored.step) == 777
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pretrained_partial_merge(self, tmp_path):
        """MODEL.PRETRAINED warm-start across architectures: leaves copy
        where key path + shape match; extra subtrees (frozen aux resnet)
        keep their init (checkpoint.load_pretrained_params)."""
        from bihome_tpu.training import checkpoint as ckpt_lib
        imgs = np.asarray(images(2))
        tx, _ = ts_lib.make_optimizer(lr=1e-3, milestones=[10], decay=0.1)

        src = tiny_built()                      # backbone only (NoOpHead)
        var_src = trainer_lib.init_model(src, imgs, seed=1)
        state_src = ts_lib.create_train_state(var_src, tx)
        ckptr = ckpt_lib.CheckPointer(str(tmp_path / 'log'))
        ckptr.save(7, jax.device_get(state_src))
        ckptr.close()

        dst = tiny_built(bihome=True)           # + auxiliary_resnet
        var_dst = trainer_lib.init_model(dst, imgs, seed=2)
        state_dst = ts_lib.create_train_state(var_dst, tx)
        merged = ckpt_lib.load_pretrained_params(str(tmp_path / 'log'),
                                                 state_dst)
        # overlapping backbone leaves take the source values
        a = jax.tree_util.tree_leaves(state_src.params['backbone'])
        b = jax.tree_util.tree_leaves(merged.params['backbone'])
        matched = sum(np.asarray(x).shape == np.asarray(y).shape
                      and np.array_equal(np.asarray(x), np.asarray(y))
                      for x, y in zip(a, b))
        assert matched > 0
        # aux subtree is absent in the source -> keeps dst init
        for x, y in zip(
                jax.tree_util.tree_leaves(state_dst.params[
                    'auxiliary_resnet']),
                jax.tree_util.tree_leaves(merged.params['auxiliary_resnet'])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
