"""Training / evaluation drivers (reference ``lib/model/{train_val,test}.py``)."""

from frcnn_tpu.engine.train import (  # noqa: F401
    SolverWrapper,
    train_net,
    filter_roidb,
    get_training_roidb,
    combined_roidb,
)
from frcnn_tpu.engine.test import test_net, im_detect  # noqa: F401
