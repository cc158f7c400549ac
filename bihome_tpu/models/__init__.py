"""Model layer: flax backbones mirroring the reference model zoo.

Registry names match the reference config strings
(ref: train.py:675-679 resolves MODEL.BACKBONE.NAME via importlib):
'ResNet34', 'Rethinking', 'ContentAware', 'HomographyNet'.
"""

from bihome_tpu.models.backbones import (  # noqa: F401
    ContentAwareBackbone,
    HomographyNetBackbone,
    ResNet34Backbone,
    RethinkingBackbone,
    build_backbone,
)
