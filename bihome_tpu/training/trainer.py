"""Training loop: jit-fused datagen + forward + loss + update, DP over mesh.

The reference hot loop (ref: train.py:284-429) becomes ONE compiled XLA
program per step: synthetic-pair generation (device), model forward, loss,
backward, Adam update, per-step LR schedule. The host only streams uint8
source images and logs scalars. Data parallelism: images batch-sharded over
the mesh 'data' axis, state replicated — XLA inserts the gradient
all-reduce over ICI (SURVEY §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bihome_tpu import geometry
from bihome_tpu.config import BuiltModel
from bihome_tpu.data import pipeline
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import losses
from bihome_tpu.training.train_state import TrainState


def init_model(built: BuiltModel, sample_images: np.ndarray,
               seed: int = 0) -> Dict[str, Any]:
    """Initialize variables by tracing datagen + model on sample images.

    Wrapped in one jax.jit: eager init would compile every conv separately
    (minutes each on a slow host); jitted it is a single cheap program.
    """
    def init_fn(images):
        batch = pipeline.generate_pairs(images, jax.random.PRNGKey(seed),
                                        built.pair_spec)
        rngs = {'params': jax.random.PRNGKey(seed)}
        if built.needs_dsac_rng:
            rngs['dsac'] = jax.random.PRNGKey(seed + 1)
        return built.model.init(rngs, batch)

    return jax.jit(init_fn)(jnp.asarray(sample_images))


def make_train_step(built: BuiltModel, tx,
                    schedule) -> Callable:
    """Build the fused train step: (state, images_u8, rng) ->
    (state, metrics)."""
    model = built.model
    spec = built.pair_spec
    loss_name = built.loss_name
    needs_dsac = built.needs_dsac_rng

    def train_step(state: TrainState, images: jax.Array,
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        gen_key, dsac_key = jax.random.split(step_rng)
        batch = pipeline.generate_pairs(images, gen_key, spec)

        def loss_fn(params):
            # Frozen subtrees (the biHomE aux extractor,
            # ref: PerceptualHead.py:35-39 requires_grad=False) are cut out
            # of the autodiff graph here, not just zeroed by the optimizer:
            # otherwise XLA runs their full weight-grad convs every step
            # (profiled ~2 ms/step on zeng-bihome) for grads that
            # optax.set_to_zero() immediately discards. Input-gradients
            # still flow through the frozen ops (the loss needs
            # d f(warp(p))/d delta), only the parameter cotangents die.
            params = {k: (jax.lax.stop_gradient(v)
                          if k.startswith('auxiliary_resnet') else v)
                      for k, v in params.items()}
            variables = {'params': params, 'batch_stats': state.batch_stats}
            rngs = {'dsac': dsac_key} if needs_dsac else None
            out, mutated = model.apply(variables, batch, train=True,
                                       rngs=rngs, mutable=['batch_stats'])
            loss = losses.compute_loss(loss_name, out)
            return loss, (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=mutated.get('batch_stats', state.batch_stats))

        metrics = {'loss/train': loss,
                   'g_norm/value': optax.global_norm(grads),
                   'lr/value': schedule(state.step)}
        if out.get('delta_gt') is not None:
            metrics['mace/train'] = geometry.mace(out['delta_gt'],
                                                  out['delta_hat'])
        metrics.update(out.get('metrics', {}))
        return new_state, metrics

    return train_step


def make_multi_train_step(built: BuiltModel, tx, schedule,
                          num_steps: int) -> Callable:
    """lax.scan over ``num_steps`` train steps in ONE dispatch.

    The single-step path is host-bound on slow hosts: enqueueing the large
    state pytree costs more than the device compute of one step. Scanning
    K steps per call amortizes dispatch K-fold. images: [K,B,H,W,3].
    Returns (state, metrics of the last step).
    """
    step = make_train_step(built, tx, schedule)

    def multi_step(state: TrainState, images: jax.Array, rng: jax.Array):
        def body(carry, xs):
            st = carry
            imgs = xs
            st, metrics = step(st, imgs, rng)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, images, length=num_steps)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    return multi_step


def make_pool_train_step(built: BuiltModel, tx, schedule, num_steps: int,
                         batch_size: int, mesh=None,
                         axis_name: str = 'data') -> Callable:
    """Scan train steps sampling batches from a DEVICE-RESIDENT image pool.

    (state, pool_u8 [N,H,W,3], rng) -> (state, last-step metrics).

    The right input architecture for slow host links (this environment's
    TPU tunnel moves ~23MB/s H2D — streaming 64x240x320x3 batches per step
    caps training at ~100 pairs/s regardless of compute): the working set
    lives in HBM, per-step batches are gathered by on-device random
    indices, and the host refreshes the pool asynchronously every few
    hundred steps. Sampling-with-replacement from a rotating uniform pool
    approximates the reference's per-epoch seeded choice over the full
    dataset (ref: src/data/coco/dataset.py:136-142).

    With ``mesh`` set, the pool is consumed SHARDED along ``axis_name``
    (pass it device_put with PartitionSpec(axis_name)): each device samples
    its B/ndev local indices from its own pool shard via shard_map — the
    gathered batch is born batch-sharded with zero collectives, pool HBM
    drops by 1/ndev, and on multi-host each host only ever uploads its own
    shard (the multi-host input architecture, SURVEY §5.8)."""
    step = make_train_step(built, tx, schedule)

    sample = None
    if mesh is not None:
        try:
            from jax import shard_map          # jax >= 0.8
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        ndev = mesh.shape[axis_name]
        if batch_size % ndev:
            raise ValueError(f'batch {batch_size} % mesh {ndev} != 0')
        local_b = batch_size // ndev

        def local_gather(pool_local, key):
            # Per-device stream: fold in the device's position on the axis.
            k = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
            idx = jax.random.randint(k, (local_b,), 0, pool_local.shape[0])
            return pipeline.take_images(pool_local, idx)

        sample = shard_map(local_gather, mesh=mesh,
                           in_specs=(P(axis_name), P()),
                           out_specs=P(axis_name))

    def pool_step(state: TrainState, pool: jax.Array, rng: jax.Array):
        def body(carry, _):
            st = carry
            # Distinct stream from the datagen key (which is
            # fold_in(rng, step) inside the train step).
            idx_key = jax.random.fold_in(jax.random.fold_in(rng, 1), st.step)
            if sample is not None:
                images = sample(pool, idx_key)
            else:
                idx = jax.random.randint(idx_key, (batch_size,), 0,
                                         pool.shape[0])
                images = pipeline.take_images(pool, idx)
            st, metrics = step(st, images, rng)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, None, length=num_steps)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    return pool_step


def make_pool_eval_step(built: BuiltModel, num_steps: int,
                        batch_size: int, test: bool = True) -> Callable:
    """Scan eval steps sampling from a device pool; returns metric means."""
    step = make_eval_step(built, test=test)

    def pool_eval(state: TrainState, pool: jax.Array, rng: jax.Array):
        def body(i, _):
            key = jax.random.fold_in(rng, i)
            idx = jax.random.randint(jax.random.fold_in(key, 1),
                                     (batch_size,), 0, pool.shape[0])
            images = pipeline.take_images(pool, idx)
            return i + 1, step(state, images, key)

        _, metrics = jax.lax.scan(body, 0, None, length=num_steps)
        return jax.tree_util.tree_map(lambda m: jnp.mean(m), metrics)

    return pool_eval


def make_multi_eval_step(built: BuiltModel, num_steps: int,
                         test: bool = True) -> Callable:
    """Scan ``num_steps`` eval steps per dispatch; returns metric means."""
    step = make_eval_step(built, test=test)

    def multi_eval(state: TrainState, images: jax.Array, rng: jax.Array):
        def body(i, _):
            return i + 1, step(state, images[i],
                               jax.random.fold_in(rng, i))

        _, metrics = jax.lax.scan(body, 0, None, length=num_steps)
        return jax.tree_util.tree_map(lambda m: jnp.mean(m), metrics)

    return multi_eval


def pick_steps_per_call(steps_per_epoch: int, log_step: int,
                        max_steps: int = 25) -> int:
    """Largest divisor of both epoch length and logging interval <= max."""
    import math
    g = math.gcd(max(steps_per_epoch, 1), max(log_step, 1))
    for d in range(min(max_steps, g), 0, -1):
        if g % d == 0:
            return d
    return 1


def make_eval_step(built: BuiltModel, test: bool = True) -> Callable:
    """(state, images_u8, rng) -> metrics (eval-mode loss + MACE),
    the eval_one_epoch body (ref: train.py:432-489)."""
    model = built.model
    spec = built.test_pair_spec if test else built.pair_spec
    loss_name = built.loss_name
    needs_dsac = built.needs_dsac_rng

    def eval_step(state: TrainState, images: jax.Array,
                  rng: jax.Array) -> Dict[str, jax.Array]:
        gen_key, dsac_key = jax.random.split(rng)
        batch = pipeline.generate_pairs(images, gen_key, spec)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        rngs = {'dsac': dsac_key} if needs_dsac else None
        out = model.apply(variables, batch, train=False, rngs=rngs)
        metrics = {'loss/test': losses.compute_loss(loss_name, out)}
        if out.get('delta_gt') is not None:
            metrics['mace/test'] = geometry.mace(out['delta_gt'],
                                                 out['delta_hat'])
        return metrics

    return eval_step


def make_predict_step(built: BuiltModel) -> Callable:
    """(state, batch) -> (delta_hat, homography|None) — the
    ModelWrapper.predict_homography chain (ref: eval.py:21-28)."""
    model = built.model
    needs_rng = (built.needs_dsac_rng
                 or (built.head_cfg.name == 'NoOpHead'
                     and built.head_cfg.target_gen == 'all_points'))

    def predict_step(state: TrainState, batch: Dict[str, jax.Array],
                     rng: jax.Array):
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        rngs = None
        if needs_rng:
            rngs = {'dsac': rng, 'ransac': rng}
        return model.apply(variables, batch, method='predict', rngs=rngs)

    return predict_step


def compile_for_mesh(step_fn: Callable, mesh, donate_state: bool = True):
    """jit a (state, images, rng) step for DP over the mesh: state
    replicated, images batch-sharded; donation keeps params in-place."""
    rep = mesh_lib.replicated_sharding(mesh)
    shard = mesh_lib.batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(rep, shard, rep),
                   donate_argnums=(0,) if donate_state else ())
