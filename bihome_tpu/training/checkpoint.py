"""Checkpointing with the reference CheckPointer's semantics on Orbax.

Mirrors ref: src/utils/checkpoint.py:31-115:
  * step-named checkpoints (``model_{step:06d}``) written per epoch,
  * a 'latest' tag for auto-resume (Orbax's ``latest_step`` replaces
    ``last_checkpoint.txt``),
  * RESTART_LEARNING_RATE drops optimizer state on resume
    (ref: train.py:722-725),
  * weights-only pretrained init (ref: train.py:735-742), accepting either
    a bihome_tpu checkpoint or a torch .pth (routed through
    models.torch_port by the caller).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from bihome_tpu.training.train_state import TrainState


class CheckPointer:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            step_prefix='model')
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def load(self, state_template: TrainState,
             step: Optional[int] = None,
             restart_learning_rate: bool = False
             ) -> Tuple[TrainState, int]:
        """Restore latest (or explicit step). Returns (state, step);
        (template, 0) when nothing to restore."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state_template, 0
        try:
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(state_template))
        except ValueError:
            # The opt_state pytree layout changed since the checkpoint was
            # written (e.g. SOLVER.GRADIENT_CLIP added/removed alters the
            # optax chain). The reference survives such config edits because
            # clipping is not optimizer state in torch (ref: train.py:392-398,
            # src/utils/checkpoint.py:67-75); match that robustness by
            # restoring weights + step and starting the optimizer fresh.
            cands = [d for d in os.listdir(self.directory)
                     if d.startswith('model_')
                     and d.split('_')[1].isdigit()
                     and int(d.split('_')[1]) == int(step)]
            if not cands:
                raise
            print(f'CheckPointer: optimizer-state layout of step {step} does '
                  'not match the current SOLVER config; resuming weights-only '
                  'with a fresh optimizer state.')
            restored, _ = load_weights_only(
                os.path.join(self.directory, cands[0]), state_template)
            restored = restored.replace(
                step=jnp.asarray(step, state_template.step.dtype))
        if restart_learning_rate:
            restored = restored.replace(opt_state=state_template.opt_state,
                                        step=state_template.step)
        return restored, int(step)

    def close(self):
        self.manager.close()


def _merge_matching(dst: Any, src: Any, stats: list) -> Any:
    """Copy leaves of src into dst where the key path exists AND shapes
    match; everything else keeps dst's value. stats accumulates
    [copied, skipped]."""
    if not isinstance(dst, dict) or not isinstance(src, dict):
        return dst
    out = dict(dst)
    for k, v in dst.items():
        if k not in src:
            continue
        s = src[k]
        if isinstance(v, dict):
            out[k] = _merge_matching(v, s, stats)
        elif (hasattr(v, 'shape') and hasattr(s, 'shape')
              and tuple(v.shape) == tuple(s.shape)):
            out[k] = np.asarray(s, dtype=np.asarray(v).dtype)
            stats[0] += 1
        else:
            stats[1] += 1
    return out


def resolve_checkpoint_dir(path: str) -> str:
    """Accept a CheckPointer log dir (picks the latest model_* step) or a
    direct step dir; returns the Orbax item directory."""
    path = os.path.abspath(path)
    steps = [d for d in (os.listdir(path) if os.path.isdir(path) else [])
             if d.startswith('model_') and
             os.path.isdir(os.path.join(path, d))]
    if steps:
        path = os.path.join(
            path, max(steps, key=lambda d: int(d.split('_')[1])))
    if os.path.isdir(os.path.join(path, 'default')):
        path = os.path.join(path, 'default')
    return path


def load_pretrained_params(path: str, state: TrainState) -> TrainState:
    """Weights-only init from a bihome_tpu checkpoint
    (MODEL.PRETRAINED semantics, ref: train.py:735-742).

    Partial by design: leaves are copied where the key path AND shape
    match the target state (torch load_state_dict(strict=False) analog),
    so e.g. a supervised zeng-orig backbone can warm-start zeng-bihome,
    whose state also holds the (absent-in-source) frozen aux extractor."""
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(resolve_checkpoint_dir(path))
    raw = dict(raw) if not isinstance(raw, dict) else raw
    stats = [0, 0]
    params = _merge_matching(state.params, raw.get('params', {}), stats)
    batch_stats = _merge_matching(state.batch_stats,
                                  raw.get('batch_stats', {}), stats)
    print(f'Pretrained: {stats[0]} tensors loaded, {stats[1]} shape-skipped '
          f'from {path}')
    return state.replace(params=params, batch_stats=batch_stats)

def load_weights_only(path: str, state: TrainState
                      ) -> Tuple[TrainState, int]:
    """Restore params/batch_stats (+step) from a checkpoint, ignoring the
    optimizer state entirely.

    The inference loader: eval.py needs no opt_state, and skipping it makes
    evaluation independent of the SOLVER configuration the checkpoint was
    trained with AND of the optimizer-state pytree layout of the code that
    wrote it (the reference analog: eval builds no optimizer at all,
    ref: eval.py:425-474)."""
    item_dir = resolve_checkpoint_dir(path)
    raw = ocp.StandardCheckpointer().restore(item_dir)
    raw = dict(raw) if not isinstance(raw, dict) else raw
    stats = [0, 0]
    params = _merge_matching(state.params, raw.get('params', {}), stats)
    batch_stats = _merge_matching(state.batch_stats,
                                  raw.get('batch_stats', {}), stats)
    if stats[1]:
        print(f'load_weights_only: {stats[1]} shape-mismatched tensors '
              f'kept from the template (loaded {stats[0]})')
    step_dir = os.path.basename(os.path.dirname(item_dir)
                                if os.path.basename(item_dir) == 'default'
                                else item_dir)
    try:
        step = int(step_dir.split('_')[1])
    except (IndexError, ValueError):
        step = int(np.asarray(raw.get('step', 0)))
    return state.replace(params=params, batch_stats=batch_stats), step
