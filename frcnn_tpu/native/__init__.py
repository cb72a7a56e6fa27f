"""Native host library (C++ via ctypes) with numpy fallbacks."""

from frcnn_tpu.native.host_ops import nms_cpu, bbox_overlaps_cpu, have_native  # noqa: F401
