"""Model graph: backbones, RPN + RoI heads, detector assembly.

Rebuild of the reference's ``lib/nets/*`` (SURVEY.md §2.2) as flax.linen
modules plus pure-functional detection stages (proposals, targets, losses) —
the reference's host/numpy mid-forward round-trips become in-graph jnp.
"""

from frcnn_tpu.models.backbones import (  # noqa: F401
    VGG16,
    ResNetV1,
    MobileNetV1,
    build_backbone,
)
from frcnn_tpu.models.network import FasterRCNN, build_model  # noqa: F401
