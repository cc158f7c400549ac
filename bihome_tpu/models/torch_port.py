"""Torch state_dict -> flax params conversion.

Needed twice by the reference design (SURVEY §7 hard part 2): pretrained
ImageNet init of backbones (ref: src/backbones/ResNet34.py:15,
Rethinking.py:158-282) and the frozen biHomE AuxiliaryResnet
(ref: src/heads/PerceptualHead.py:21-22). This module converts torchvision
resnet state_dicts (loaded from a local .pth — no network in this
environment) into the parameter trees of bihome_tpu.models.resnet.ResNet and
the Rethinking encoder stages.

Layout conversions:
  conv   OIHW -> HWIO          (transpose 2,3,1,0)
  linear [out,in] -> [in,out]  (transpose)
  convT  (in,out,kh,kw) -> flax transpose_kernel=True (kh,kw,out,in)
  bn     weight/bias -> params.scale/bias; running_* -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint into numpy arrays (CPU, no grad)."""
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(state, dict) and 'state_dict' in state:
        state = state['state_dict']
    if isinstance(state, dict) and 'model' in state and not any(
            k.endswith('.weight') for k in state):
        state = state['model']
    return {k: np.asarray(v.detach().numpy() if hasattr(v, 'detach') else v)
            for k, v in state.items()}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def port_torchvision_resnet(
        state_dict: Dict[str, np.ndarray],
        num_input_channels: Optional[int] = None,
        include_fc: bool = True,
        sum_rgb_stem: bool = False) -> Dict[str, Dict]:
    """Convert a torchvision resnet state_dict to
    {'params': ..., 'batch_stats': ...} for models.resnet.ResNet.

    ``num_input_channels``: if set and != 3, the stem conv weights are
    dropped (the reference replaces conv1 with a fresh 2-channel conv,
    ref: src/backbones/ResNet34.py:17).

    ``sum_rgb_stem``: sum the ImageNet conv1 kernel over its RGB input
    channels -> a 1-channel stem. Exactly equivalent to the reference's
    grayscale->3ch repeat (PerceptualHead.py:56-60) since
    conv(repeat(x, 3), w) == conv(x, w.sum(in_ch)); used for the frozen
    biHomE aux extractor so the stem runs at a third of the FLOPs.
    """
    params: Dict = {}
    stats: Dict = {}
    for key, val in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        parts = key.split('.')
        if parts[0] == 'conv1':
            if num_input_channels not in (None, 3) and not sum_rgb_stem:
                continue
            kern = conv_kernel(val)
            if sum_rgb_stem:
                kern = kern.sum(axis=2, keepdims=True)
            _set(params, ('conv1', 'kernel'), kern)
        elif parts[0] == 'bn1':
            _port_bn(params, stats, ('bn1',), parts[1], val)
        elif parts[0] == 'fc':
            if not include_fc:
                continue
            if parts[1] == 'weight':
                _set(params, ('fc', 'kernel'), linear_kernel(val))
            else:
                _set(params, ('fc', 'bias'), val)
        elif parts[0].startswith('layer'):
            block = f'{parts[0]}_{parts[1]}'
            rest = parts[2:]
            if rest[0] == 'downsample':
                if rest[1] == '0':
                    _set(params, (block, 'downsample_conv', 'kernel'),
                         conv_kernel(val))
                else:
                    _port_bn(params, stats, (block, 'downsample_bn'),
                             rest[2], val)
            elif rest[0].startswith('conv'):
                _set(params, (block, rest[0], 'kernel'), conv_kernel(val))
            elif rest[0].startswith('bn'):
                _port_bn(params, stats, (block, rest[0]), rest[1], val)
    return {'params': params, 'batch_stats': stats}


def _port_bn(params: Dict, stats: Dict, path: Tuple[str, ...],
             field: str, val: np.ndarray) -> None:
    if field == 'weight':
        _set(params, path + ('scale',), val)
    elif field == 'bias':
        _set(params, path + ('bias',), val)
    elif field == 'running_mean':
        _set(stats, path + ('mean',), val)
    elif field == 'running_var':
        _set(stats, path + ('var',), val)


_RETHINKING_BLOCK_FIELDS = {
    'conv1': ('upper_conv1', 'conv'),
    'bn1': ('upper_bn1', 'bn'),
    'conv2': ('upper_conv2', 'conv'),
    'bn2': ('upper_bn2', 'bn'),
    'conv3': ('upper_conv3', 'conv'),
    'bn3': ('upper_bn3', 'bn'),
}


def port_rethinking_encoder(state_dict: Dict[str, np.ndarray]
                            ) -> Dict[str, Dict]:
    """Remap torchvision resnet layer{1,2,3} into Rethinking layer{2,3,4}_*
    blocks, replicating the reference's renamed partial load
    (ref: src/backbones/Rethinking.py:158-282):
      layerK.B.convN -> layer{K+1}_B.upper_convN
      layerK.B.bnN   -> layer{K+1}_B.upper_bnN
      downsample.0/1 -> lower_conv / lower_bn
    """
    params: Dict = {}
    stats: Dict = {}
    for key, val in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        parts = key.split('.')
        if not parts[0].startswith('layer'):
            continue
        layer_idx = int(parts[0][5:])
        if layer_idx > 3:
            continue
        block = f'layer{layer_idx + 1}_{parts[1]}'
        rest = parts[2:]
        if rest[0] == 'downsample':
            if rest[1] == '0':
                _set(params, (block, 'lower_conv', 'kernel'),
                     conv_kernel(val))
            else:
                _port_bn(params, stats, (block, 'lower_bn'), rest[2], val)
        elif rest[0] in _RETHINKING_BLOCK_FIELDS:
            name, kind = _RETHINKING_BLOCK_FIELDS[rest[0]]
            if kind == 'conv':
                _set(params, (block, name, 'kernel'), conv_kernel(val))
            else:
                _port_bn(params, stats, (block, name), rest[1], val)
    return {'params': params, 'batch_stats': stats}


def graft(variables: Dict, ported: Dict, prefix: Tuple[str, ...] = ()
          ) -> Dict:
    """Recursively merge ``ported`` {'params','batch_stats'} into flax
    ``variables`` at ``prefix``, validating shapes. Returns new tree."""
    import jax

    def merge(dst, src, path):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge(dst.get(k, {}), v, path + (k,))
            else:
                if k in dst and hasattr(dst[k], 'shape'):
                    if tuple(dst[k].shape) != tuple(v.shape):
                        raise ValueError(
                            f'shape mismatch at {"/".join(path + (k,))}: '
                            f'{dst[k].shape} vs {v.shape}')
                out[k] = np.asarray(v, dtype=np.float32)
        return out

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    result = dict(variables)
    for collection in ('params', 'batch_stats'):
        if collection not in ported or not ported[collection]:
            continue
        node = dict(result.get(collection, {}))
        sub = node
        chain = [node]
        for p in prefix:
            nxt = dict(sub.get(p, {}))
            sub[p] = nxt
            sub = nxt
            chain.append(nxt)
        merged = merge(sub, ported[collection], prefix)
        sub.clear()
        sub.update(merged)
        result[collection] = node
    return result
