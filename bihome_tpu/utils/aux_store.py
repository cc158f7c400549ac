"""Flat .npz save/load for the auxiliary-extractor subtree.

The reference initializes the frozen biHomE extractor from downloaded
ImageNet weights (ref: src/heads/PerceptualHead.py:21-22); with no network,
train.py also accepts a native .npz produced by tools/pretrain_aux.py via
HEAD.AUXILIARY_RESNET_PATH. Only conv1/bn1/layer1 (+layer2 when trained
with --layers 2) leaves are stored — everything the PerceptualHead
consumes at AUXILIARY_RESNET_OUTPUT_LAYER<=2; grafting prunes to the
model's actual truncation depth (prune_to_template).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_KEEP_PREFIXES = ('conv1', 'bn1', 'layer1_', 'layer2_')


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
    """-> {'params': subtree, 'batch_stats': subtree} (conv1/bn1/layer1[/2])."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    return {'params': tree.get('params', {}),
            'batch_stats': tree.get('batch_stats', {})}


def prune_to_template(tree: Dict, template: Dict):
    """Drop subtrees/leaves of ``tree`` that have no counterpart in
    ``template`` — e.g. a --layers 2 extractor npz grafted into a model at
    AUXILIARY_RESNET_OUTPUT_LAYER=1, whose truncated auxiliary_resnet has
    no layer2 params (torch_port.graft would otherwise INSERT them and
    flax apply would reject the unused params).

    Returns (pruned_tree, dropped) where dropped is the sorted list of
    '/'-joined paths that were removed."""
    dropped = []

    def walk(src: Dict, tmpl: Dict, path: str) -> Dict:
        out = {}
        for k, v in src.items():
            here = f'{path}/{k}' if path else k
            if k not in tmpl:
                dropped.append(here)
            elif isinstance(v, dict):
                out[k] = walk(v, tmpl[k] if isinstance(tmpl[k], dict) else {},
                              here)
            else:
                out[k] = v
        return out

    return walk(tree, template, ''), sorted(dropped)
