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


def load_torch_state_dict(path: str, full_checkpoint: bool = False
                          ) -> Dict[str, Any]:
    """Load a .pth checkpoint into numpy arrays (CPU, no grad).

    With ``full_checkpoint=True`` the reference training-checkpoint dict
    {'model': state_dict, 'step': N, ...} is returned with tensors
    converted but structure preserved (for port_reference_checkpoint)."""
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)

    def np_of(v):
        return np.asarray(v.detach().numpy() if hasattr(v, 'detach') else v)

    if full_checkpoint:
        model = state['model'] if isinstance(state, dict) and \
            'model' in state else state
        out = {'model': {k: np_of(v) for k, v in model.items()}}
        if isinstance(state, dict) and 'step' in state:
            out['step'] = int(state['step'])
        return out
    if isinstance(state, dict) and 'state_dict' in state:
        state = state['state_dict']
    if isinstance(state, dict) and 'model' in state and not any(
            k.endswith('.weight') for k in state):
        state = state['model']
    return {k: np_of(v) for k, v in state.items()}


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


# --------------------------------------------------------------------- #
# Full reference-checkpoint import (ref: src/utils/checkpoint.py:31-115)
#
# A reference training checkpoint is torch.save({'model': state_dict,
# 'optimizer': ..., 'scheduler': ..., 'step': N}) where the model is
# nn.Sequential(backbone, head) -> keys '0.*' (backbone) and '1.*' (head).
# --------------------------------------------------------------------- #

# Sequential-index -> our param name, per reference block class
# (ref: src/backbones/utils.py:4-152). 'ct' = ConvTranspose weight layout.
_BLOCK_MAPS = {
    'r34': {'upper_branch.0': ('upper_conv1', 'conv'),
            'upper_branch.1': ('upper_bn1', 'bn'),
            'upper_branch.3': ('upper_conv2', 'conv'),
            'upper_branch.4': ('upper_bn2', 'bn'),
            'lower_branch.0': ('lower_conv', 'conv'),
            'lower_branch.1': ('lower_bn', 'bn')},
    'r50': {'upper_branch.0': ('upper_conv1', 'conv'),
            'upper_branch.1': ('upper_bn1', 'bn'),
            'upper_branch.3': ('upper_conv2', 'conv'),
            'upper_branch.4': ('upper_bn2', 'bn'),
            'upper_branch.6': ('upper_conv3', 'conv'),
            'upper_branch.7': ('upper_bn3', 'bn'),
            'lower_branch.0': ('lower_conv', 'conv'),
            'lower_branch.1': ('lower_bn', 'bn')},
    'deconv50': {'upper_branch.0': ('upper_deconv', 'ct'),
                 'upper_branch.1': ('upper_conv1', 'conv'),
                 'upper_branch.2': ('upper_bn1', 'bn'),
                 'upper_branch.4': ('upper_conv2', 'conv'),
                 'upper_branch.5': ('upper_bn2', 'bn'),
                 'lower_branch.0': ('lower_deconv', 'ct'),
                 'lower_branch.1': ('lower_bn', 'bn')},
    'deconv34': {'upper_branch.0': ('upper_deconv', 'ct'),
                 'upper_branch.1': ('upper_conv1', 'conv'),
                 'upper_branch.2': ('upper_bn1', 'bn'),
                 'lower_branch.0': ('lower_deconv', 'ct'),
                 'lower_branch.1': ('lower_bn', 'bn')},
}

# Rethinking stage layouts: block class per sequential index
# (ref: src/backbones/Rethinking.py:42-133). Both flavors share counts;
# every stage 4-7 ends with the ResNet50-flavor deconv block.
def _rethinking_stage_types(flavor: str) -> Dict[str, list]:
    b = 'r50' if flavor == 'ResNet50' else 'r34'
    return {
        'layer2': [b, b, b],
        'layer3': [b, b, b, b],
        'layer4': [b, b, b, b, b, b, 'deconv50'],
        'layer5': [b, b, b, 'deconv50'],
        'layer6': [b, b, 'deconv50'],
        'layer7': [b, 'deconv50'],
    }


def _port_entry(params: Dict, stats: Dict, block_path: Tuple[str, ...],
                name: str, kind: str, field: str, val: np.ndarray) -> None:
    if kind == 'bn':
        _port_bn(params, stats, block_path + (name,), field, val)
    elif field == 'weight':
        tf = conv_transpose_kernel if kind == 'ct' else conv_kernel
        _set(params, block_path + (name, 'kernel'), tf(val))
    elif field == 'bias':
        _set(params, block_path + (name, 'bias'), val)


def port_rethinking_full(state_dict: Dict[str, np.ndarray],
                         flavor: str = 'ResNet34') -> Dict[str, Dict]:
    """Port a full trained Rethinking backbone state_dict (encoder +
    decoder deconvs + PF head) to our RethinkingBackbone tree
    (ref: src/backbones/Rethinking.py:27-149)."""
    params: Dict = {}
    stats: Dict = {}
    stages = _rethinking_stage_types(flavor)
    for key, val in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        parts = key.split('.')
        stage = parts[0]
        if stage == 'layer1':
            # Seq(Conv, BN, ReLU, MaxPool)
            if parts[1] == '0':
                _set(params, ('layer1_conv', 'kernel'), conv_kernel(val))
            else:
                _port_bn(params, stats, ('layer1_bn',), parts[2], val)
        elif stage == 'layer8':
            # Seq(Conv(bias), BN, ReLU, Conv(bias)) -> PFHead 'layer8'
            idx, field = parts[1], parts[2]
            if idx == '0':
                tgt = ('layer8', 'conv1_kernel' if field == 'weight'
                       else 'conv1_bias')
                _set(params, tgt, conv_kernel(val)
                     if field == 'weight' else val)
            elif idx == '1':
                if field == 'weight':
                    _set(params, ('layer8', 'bn_scale'), val)
                elif field == 'bias':
                    _set(params, ('layer8', 'bn_bias'), val)
                elif field == 'running_mean':
                    _set(stats, ('layer8', 'bn_mean'), val)
                elif field == 'running_var':
                    _set(stats, ('layer8', 'bn_var'), val)
            elif idx == '3':
                tgt = ('layer8', 'conv2_kernel' if field == 'weight'
                       else 'conv2_bias')
                _set(params, tgt, conv_kernel(val)
                     if field == 'weight' else val)
        elif stage in stages:
            types = stages[stage]
            bidx = int(parts[1])
            btype = types[bidx]
            block = (f'{stage}_deconv' if btype.startswith('deconv')
                     else f'{stage}_{bidx}')
            inner = '.'.join(parts[2:4])          # e.g. 'upper_branch.3'
            field = parts[4]
            entry = _BLOCK_MAPS[btype].get(inner)
            if entry is not None:
                _port_entry(params, stats, (block,), entry[0], entry[1],
                            field, val)
    return {'params': params, 'batch_stats': stats}


def port_content_aware(state_dict: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Port a trained ContentAware backbone: mask predictor + feature
    extractor (layerK = Seq(Conv, BN), ref: src/backbones/ContentAware.py:
    6-80) + 2-channel resnet34 regressor."""
    params: Dict = {}
    stats: Dict = {}
    resnet_sub = {}
    for key, val in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        parts = key.split('.')
        if parts[0] in ('mask_predictor', 'feature_extractor'):
            sub = parts[0]
            n = parts[1][5:]                       # layerK -> K
            if parts[2] == '0':
                _set(params, (sub, f'conv{n}', 'kernel'), conv_kernel(val))
            else:
                _port_bn(params, stats, (sub, f'bn{n}'), parts[3], val)
        elif parts[0] == 'resnet34':
            resnet_sub['.'.join(parts[1:])] = val
    ported = port_torchvision_resnet(resnet_sub)
    _merge_subtree(params, {'resnet34': ported['params']})
    _merge_subtree(stats, {'resnet34': ported['batch_stats']})
    return {'params': params, 'batch_stats': stats}


def port_homography_net(state_dict: Dict[str, np.ndarray],
                        image_size: int = 128) -> Dict[str, Dict]:
    """Port the HomographyNet backbone (layerK = Seq(Conv, ReLU, BN
    [, MaxPool]), ref: src/backbones/HomographyNet.py:14-34). The fc1
    kernel is permuted CHW->HWC to match NHWC flattening."""
    params: Dict = {}
    stats: Dict = {}
    for key, val in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        parts = key.split('.')
        if parts[0].startswith('layer'):
            n = parts[0][5:]
            if parts[1] == '0':
                if parts[2] == 'weight':
                    _set(params, (f'conv{n}', 'kernel'), conv_kernel(val))
                else:
                    _set(params, (f'conv{n}', 'bias'), val)
            else:                                  # index 2: BN
                _port_bn(params, stats, (f'bn{n}',), parts[3], val)
        elif parts[0] == 'fc1':
            if parts[2] == 'weight':
                spatial = 16 if image_size == 128 else 16
                w = val.reshape(val.shape[0], 128, spatial, spatial)
                w = np.transpose(w, (0, 2, 3, 1)).reshape(val.shape[0], -1)
                _set(params, ('fc1', 'kernel'), linear_kernel(w))
            else:
                _set(params, ('fc1', 'bias'), val)
        elif parts[0] == 'fc2':
            _set(params, ('fc2', 'kernel' if parts[1] == 'weight'
                          else 'bias'),
                 linear_kernel(val) if parts[1] == 'weight' else val)
    return {'params': params, 'batch_stats': stats}


def _merge_subtree(dst: Dict, src: Dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            _merge_subtree(dst.setdefault(k, {}), v)
        else:
            dst[k] = v


def _split_prefix(state_dict: Dict[str, np.ndarray], prefix: str
                  ) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in state_dict.items()
            if k.startswith(prefix)}


def port_reference_checkpoint(data: Dict, config: Dict,
                              variables: Dict) -> Tuple[Dict, int]:
    """Load a complete reference training checkpoint into flax variables.

    ``data``: the torch.load'ed dict {'model': ..., 'step': N, ...} where
    model keys are '0.*' (backbone) / '1.*' (head) from
    nn.Sequential(backbone, head) (ref: train.py:696,
    src/utils/checkpoint.py:40-48). Returns (variables, step).
    """
    state = {k: np.asarray(v) for k, v in data['model'].items()}
    bcfg = config['MODEL']['BACKBONE']
    hcfg = config['MODEL'].get('HEAD', {})
    backbone_sd = _split_prefix(state, '0.')
    head_sd = _split_prefix(state, '1.')

    name = bcfg['NAME']
    if name == 'Rethinking':
        ported = port_rethinking_full(
            backbone_sd, flavor=bcfg.get('RESNET_BLOCK', 'ResNet34'))
    elif name == 'ResNet34':
        ported = port_torchvision_resnet(_split_prefix(backbone_sd,
                                                       'resnet34.'))
        ported = {'params': {'resnet34': ported['params']},
                  'batch_stats': {'resnet34': ported['batch_stats']}}
    elif name == 'ContentAware':
        ported = port_content_aware(backbone_sd)
    elif name == 'HomographyNet':
        ported = port_homography_net(backbone_sd,
                                     int(bcfg.get('IMAGE_SIZE', 128)))
    else:
        raise ValueError(f'Unknown backbone for checkpoint port: {name}')
    variables = graft(variables, ported, ('backbone',))

    if hcfg.get('NAME') == 'PerceptualHead':
        aux_sd = _split_prefix(head_sd, 'resnet.')
        if aux_sd:
            aux_c = variables['params']['auxiliary_resnet'][
                'conv1']['kernel'].shape[2]
            ported = port_torchvision_resnet(aux_sd, include_fc=False,
                                             sum_rgb_stem=(aux_c == 1))
            variables = graft(variables, ported, ('auxiliary_resnet',))
        # projection_head ModuleList interleaves Linear/ReLU: Linears sit
        # at even indices (ref: PerceptualHead.py:43-48).
        proj = {}
        for key, val in _split_prefix(head_sd, 'projection_head.').items():
            idx, field = key.split('.')
            name_i = f'projection_{int(idx) // 2}'
            proj.setdefault(name_i, {})[
                'kernel' if field == 'weight' else 'bias'] = (
                linear_kernel(val) if field == 'weight' else val)
        if proj:
            variables = graft(variables, {'params': proj})
        score_sd = _split_prefix(head_sd, 'dsac.score_cnn.resnet18.')
        if score_sd:
            ported = port_torchvision_resnet(score_sd)
            variables = graft(variables, ported, ('score_cnn',))

    step = int(data.get('step', 0))
    return variables, step


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
