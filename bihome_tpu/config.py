"""Config system: the reference YAML surface, assembled the JAX way.

Reads the UNCHANGED reference config files (MODEL/DATA/SOLVER/LOGGING
sections, ref: train.py:544-757) and builds framework objects. Where the
reference resolves class names with importlib (ref: train.py:62-64,105-120,
675-690), we use explicit registries — same config strings, static dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import yaml

from bihome_tpu.data.pipeline import PairSpec
from bihome_tpu.heads import AssembledModel, HeadConfig
from bihome_tpu.models import build_backbone


def load_config(path: str) -> Dict[str, Any]:
    with open(path, 'r') as f:
        return yaml.full_load(f)


def apply_overrides(config: Dict[str, Any], overrides) -> Dict[str, Any]:
    """Apply dotted-key CLI overrides in place: 'A.B.C=val'.

    Values parse as YAML scalars ('1e-3' -> float, 'true' -> bool,
    bare words -> str). Intermediate dicts are created as needed, so
    framework-extension keys (e.g. MODEL.HEAD.AUXILIARY_RESNET_PATH to
    point at a local weight file) can be set without editing the
    reference-identical YAMLs."""
    for item in overrides or ():
        key, sep, raw = item.partition('=')
        if not sep:
            raise ValueError(f'--set expects KEY=VALUE, got {item!r}')
        node = config
        parts = key.split('.')
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f'{key}: {part} is not a mapping')
        value = yaml.safe_load(raw) if raw != '' else ''
        if isinstance(value, str):
            # YAML 1.1 only floats '1.0e-4', not '1e-4' — accept both.
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        node[parts[-1]] = value
    return config


def _emit_images_for(head_cfg: HeadConfig) -> Tuple[str, ...]:
    """Which full-size images the head actually consumes.

    PhotometricHead reads the full image named in LEARNING_KEYS[1]
    (ref: src/heads/PhotometricHead.py:31); everything else needs none —
    the reference materializes image_1/image_2 per sample regardless
    (ref: transforms.py:724), we only pay for what is consumed.
    """
    if head_cfg.name == 'PhotometricHead':
        return (head_cfg.learning_keys[1],)
    return ()


@dataclasses.dataclass
class BuiltModel:
    model: AssembledModel
    head_cfg: HeadConfig
    pair_spec: PairSpec
    test_pair_spec: PairSpec
    loss_name: str
    config: Dict[str, Any]

    @property
    def needs_dsac_rng(self) -> bool:
        return (self.head_cfg.name == 'PerceptualHead'
                and not self.head_cfg.delta_hat_keys)


def build_model(config: Dict[str, Any], dtype=None) -> BuiltModel:
    """Assemble the model. Compute dtype: explicit arg > MODEL.DTYPE config
    key ('bfloat16'|'float32') > float32. Params always stay float32."""
    if dtype is None:
        dtype = {'bfloat16': jnp.bfloat16, 'float32': jnp.float32}[
            config['MODEL'].get('DTYPE', 'float32')]
    backbone = build_backbone(config['MODEL']['BACKBONE'], dtype=dtype)
    head_cfg = HeadConfig.from_yaml(config['MODEL']['HEAD'],
                                    config['MODEL']['BACKBONE'])
    model = AssembledModel(backbone=backbone, head=head_cfg, dtype=dtype)
    emit = _emit_images_for(head_cfg)
    # Blob occlusion augmentation applies to both loaders when configured
    # (ref: train.py:574-620 passes the collator to train AND test).
    blob_kw = {}
    if config['DATA'].get('AUGMENT_BLOB_POROSITY') is not None:
        blob_kw['blob_porosity'] = float(
            config['DATA']['AUGMENT_BLOB_POROSITY'])
        blob_kw['blobiness'] = float(
            config['DATA'].get('AUGMENT_BLOBINESS', 1.0))
    pair_spec = dataclasses.replace(
        PairSpec.from_transforms(config['DATA']['TRANSFORMS'],
                                 emit_images=emit),
        warp_dtype=('bfloat16' if dtype == jnp.bfloat16 else 'float32'),
        **blob_kw)
    test_transforms = config['DATA'].get('TEST_TRANSFORM',
                                         config['DATA']['TRANSFORMS'])
    test_pair_spec = dataclasses.replace(
        PairSpec.from_transforms(test_transforms, emit_images=emit),
        **blob_kw)
    loss_name = config['SOLVER']['LOSS']
    return BuiltModel(model=model, head_cfg=head_cfg, pair_spec=pair_spec,
                      test_pair_spec=test_pair_spec, loss_name=loss_name,
                      config=config)


def solver_kwargs(config: Dict[str, Any]) -> Dict[str, Any]:
    solver = config['SOLVER']
    assert solver.get('OPTIMIZER', 'Adam') == 'Adam', \
        'I do not have this solver implemented yet.'  # ref: train.py:708-709
    return dict(
        lr=float(solver['LR']),
        milestones=solver.get('MILESTONES', []),
        decay=float(solver.get('LR_DECAY', 0.1)),
        beta1=float(solver.get('MOMENTUM_1', 0.9)),
        beta2=float(solver.get('MOMENTUM_2', 0.999)),
        weight_decay=float(solver.get('L2_WEIGHT_DECAY', 0.0)),
        gradient_clip=float(solver.get('GRADIENT_CLIP', -1)),
    )
