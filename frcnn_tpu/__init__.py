"""frcnn_tpu — a TPU-native Faster R-CNN framework in JAX.

A ground-up rebuild of the capabilities of ``pengfeidip/pytorch-faster-rcnn``
(see /root/repo/SURVEY.md for the structural analysis of the reference):
a two-stage detector (RPN + RoI box head) over VGG-16 / ResNet / MobileNet
backbones, trained on Pascal VOC / COCO with joint 4-loss SGD, evaluated with
VOC mAP / COCO mAP.

Design stance (not a port):
  * one jitted, fixed-shape, pure-functional graph per mode (train / predict);
  * every host/numpy round-trip of the reference (anchor & proposal target
    layers, NMS wrappers — reference lib/nets/network.py:~L150-L220) becomes a
    vectorized jnp function or a Pallas TPU kernel on padded fixed-size arrays
    with validity masks;
  * parallelism via jax.sharding.Mesh + NamedSharding (data axis over ICI),
    not host-side loops.
"""

__version__ = "0.1.0"

from frcnn_tpu.config import cfg, default_config, cfg_from_file, cfg_from_list  # noqa: F401
