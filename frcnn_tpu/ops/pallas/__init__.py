"""Pallas TPU kernels for the detector's hot native ops.

TPU-native replacements for the reference's CUDA kernels
(``lib/nms/src/cuda/nms_kernel.cu``, ``lib/layer_utils/roi_align/src/*.cu`` —
SURVEY.md §2.4).  Each kernel has a pure-jnp twin in ``frcnn_tpu/ops`` that
defines its numerical truth; equivalence is tested in
``tests/test_pallas_kernels.py`` (interpreter mode on CPU, compiled on TPU).
"""
