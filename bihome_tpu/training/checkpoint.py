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
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template))
        if restart_learning_rate:
            restored = restored.replace(opt_state=state_template.opt_state,
                                        step=state_template.step)
        return restored, int(step)

    def close(self):
        self.manager.close()


def load_pretrained_params(path: str, state: TrainState) -> TrainState:
    """Weights-only init from a bihome_tpu checkpoint directory
    (MODEL.PRETRAINED semantics, ref: train.py:735-742)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), state)
    return state.replace(params=restored.params,
                         batch_stats=restored.batch_stats)
