"""SOLVER.LOSS dispatch with torch-equivalent reductions.

Mirrors the reference trainer's loss dispatch (ref: train.py:316-376):
tensor losses (MSELoss / L1Loss / SmoothL1Loss, torch default 'mean'
reduction over all elements) apply to the head's
(ground_truth, network_output); 'CosineDistance' is
sum(1 - cos_sim) (ref: train.py:325-327); the self-computed losses
('TripletLoss', 'iHomE', 'biHomE') pass the head's scalar through.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array

TENSOR_LOSSES = ('MSELoss', 'L1Loss', 'SmoothL1Loss', 'CosineDistance')
SELF_LOSSES = ('TripletLoss', 'iHomE', 'biHomE')


def compute_loss(loss_name: str, head_out: Dict[str, Any]) -> Array:
    if loss_name == 'MSELoss':
        return jnp.mean(jnp.square(head_out['ground_truth']
                                   - head_out['network_output']))
    if loss_name == 'L1Loss':
        return jnp.mean(jnp.abs(head_out['ground_truth']
                                - head_out['network_output']))
    if loss_name == 'SmoothL1Loss':
        diff = head_out['ground_truth'] - head_out['network_output']
        adiff = jnp.abs(diff)
        return jnp.mean(jnp.where(adiff < 1.0, 0.5 * diff * diff,
                                  adiff - 0.5))
    if loss_name == 'CosineDistance':
        gt = head_out['ground_truth']
        out = head_out['network_output']
        # torch cosine_similarity(dim=1): channel axis — NHWC maps the
        # channel axis to -1 for feature maps, axis 1 otherwise.
        axis = -1 if gt.ndim == 4 else 1
        num = jnp.sum(gt * out, axis=axis)
        den = jnp.maximum(jnp.linalg.norm(gt, axis=axis)
                          * jnp.linalg.norm(out, axis=axis), 1e-8)
        return jnp.sum(1.0 - num / den)
    if loss_name in SELF_LOSSES:
        return head_out['loss']
    raise ValueError(f'Do not know the loss: {loss_name}')
