"""Flat .npz save/load for the auxiliary-extractor subtree.

The reference initializes the frozen biHomE extractor from downloaded
ImageNet weights (ref: src/heads/PerceptualHead.py:21-22); with no network,
train.py also accepts a native .npz produced by tools/pretrain_aux.py via
HEAD.AUXILIARY_RESNET_PATH. Only conv1/bn1/layer1 leaves are stored — all
the PerceptualHead consumes at AUXILIARY_RESNET_OUTPUT_LAYER=1.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_KEEP_PREFIXES = ('conv1', 'bn1', 'layer1_')


def _flatten(tree: Dict, prefix: str = '') -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f'{prefix}{k}' if not prefix else f'{prefix}/{k}'
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        parts = path.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_aux_npz(path: str, variables: Dict) -> None:
    flat = {}
    for coll in ('params', 'batch_stats'):
        for k, v in _flatten(variables.get(coll, {})).items():
            if k.startswith(_KEEP_PREFIXES):
                flat[f'{coll}/{k}'] = v
    np.savez(path, **flat)


def load_aux_npz(path: str) -> Dict[str, Dict]:
    """-> {'params': subtree, 'batch_stats': subtree} (conv1/bn1/layer1)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    return {'params': tree.get('params', {}),
            'batch_stats': tree.get('batch_stats', {})}
