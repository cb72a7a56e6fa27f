"""Detection ops: the algorithmic core of the detector.

Pure-functional, fixed-shape jnp implementations of the reference's
``lib/layer_utils/*`` + ``lib/model/bbox_transform.py`` (SURVEY.md §2.3), plus
Pallas TPU kernels for the two hot native ops (NMS, RoIAlign — reference
``lib/nms/``, ``lib/layer_utils/roi_align/``).
"""

from frcnn_tpu.ops.anchors import generate_anchors, generate_anchors_pre  # noqa: F401
from frcnn_tpu.ops.boxes import (  # noqa: F401
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlaps,
)
from frcnn_tpu.ops.nms import nms_mask, nms_fixed, batched_class_nms  # noqa: F401
from frcnn_tpu.ops.roi_align import roi_align, roi_pool, crop_and_resize_pool  # noqa: F401
