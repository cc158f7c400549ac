"""Train state + optimizer assembly with reference solver semantics."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(lr: float, milestones, decay: float):
    """Per-step MultiStepLR: the reference steps the scheduler every
    ITERATION with milestones in step units (ref: train.py:387,710-711)."""
    return optax.piecewise_constant_schedule(
        lr, {int(m): decay for m in milestones})


def make_optimizer(lr: float, milestones, decay: float,
                   beta1: float = 0.9, beta2: float = 0.999,
                   weight_decay: float = 0.0, gradient_clip: float = -1.0,
                   frozen_prefixes=('auxiliary_resnet',)):
    """Adam + per-step MultiStepLR + optional global-norm clip, with frozen
    subtrees (the biHomE aux extractor) receiving zero updates.

    Matches torch semantics: clip first (ref: train.py:382-383), weight
    decay added to the gradient before Adam moments (torch Adam
    weight_decay), then Adam, then -lr scaling.
    """
    schedule = make_lr_schedule(lr, milestones, decay)
    chain = []
    if gradient_clip and gradient_clip > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip))
    if weight_decay and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(schedule))
    # NOT optax.flatten: measured SLOWER (detone-orig batch 128:
    # 10,352 -> 7,654 pairs/s). The per-layer update fusions cost ~2.2
    # ms/step of launch overhead, but flatten replaces them with a ~110-way
    # ravel concat + ~110 unflatten slices — MORE small ops under this
    # runtime's flat per-op tax. See BENCH_NOTES.md round-2 profile notes.
    trainable_tx = optax.chain(*chain)

    def label_fn(params):
        def label(path, _):
            top = path[0].key if hasattr(path[0], 'key') else str(path[0])
            return ('frozen' if any(top.startswith(p)
                                    for p in frozen_prefixes)
                    else 'trainable')
        return jax.tree_util.tree_map_with_path(label, params)

    tx = optax.multi_transform(
        {'trainable': trainable_tx, 'frozen': optax.set_to_zero()}, label_fn)
    return tx, schedule


def create_train_state(variables: Dict[str, Any], tx) -> TrainState:
    params = variables['params']
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params))
