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


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt-out: FRCNN_TPU_NO_COMPILE_CACHE).

    The full detect/train graphs take minutes to compile on a tunneled TPU;
    the cache (keyed by HLO hash + compiler version) makes every rerun of
    bench.py / the CLIs start in seconds.  Only set when the user hasn't
    configured one; only graphs that took >5 s to compile are written."""
    import os

    if os.environ.get("FRCNN_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        path = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")), "frcnn_tpu_xla")
        try:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except (OSError, AttributeError):  # read-only home / older jax
            pass


_enable_compile_cache()

from frcnn_tpu.config import cfg, default_config, cfg_from_file, cfg_from_list  # noqa: E402,F401
