"""Data pipeline: datasets (imdb/VOC/COCO + evaluators) and the minibatch
loader (SURVEY.md §2.5).  Host-side work is deliberately minimal — JPEG
decode + aspect-preserving resize + pad-to-bucket; normalization and
augmentation geometry live in the jitted graph."""

from frcnn_tpu.data.factory import get_imdb, list_imdbs  # noqa: F401
from frcnn_tpu.data.loader import RoIDataLayer, get_minibatch  # noqa: F401
