"""ctypes binding for the native minibatch image-prep worker.

Lazy-builds ``libfrcnn_data_prep.so`` with g++ against the system OpenCV
(``pkg-config opencv4``) on first use, like host_ops.  Falls back to None
when OpenCV dev files or the compiler are unavailable — callers
(data/loader.get_minibatch) then keep the pure-Python cv2 path.  The two
paths agree within <=1e-4 relative (identical op order; the cv2 wheel's
bundled OpenCV rounds INTER_LINEAR slightly differently than the system
build); a given run uses one path consistently, so exact-resume holds.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
import sys

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SO = osp.join(_DIR, "libfrcnn_data_prep.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_SO):
        try:
            flags = subprocess.run(
                ["pkg-config", "--cflags", "--libs", "opencv4"],
                check=True, capture_output=True, text=True,
                timeout=30).stdout.split()
            # only the three modules we use — the full opencv4 link line
            # drags in dozens of contrib libs
            libs = [f for f in flags if not f.startswith("-l")] + [
                "-lopencv_core", "-lopencv_imgcodecs", "-lopencv_imgproc"]
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 osp.join(_DIR, "data_prep.cc"), "-o", _SO] + libs,
                check=True, capture_output=True, timeout=300)
        except Exception:
            _warn_fallback("build failed (system OpenCV dev files or g++ "
                           "unavailable)")
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.frcnn_prep_batch.restype = ctypes.c_int
        lib.frcnn_prep_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
    except OSError:
        _warn_fallback("dlopen failed")
        _lib = None
    return _lib


def _warn_fallback(why: str) -> None:
    # Loud, once (guarded by _tried): silent degradation would hide a
    # broken auto-build — the cv2 path is correct but single-threaded.
    print(f"frcnn_tpu.native.data_prep: C++ prep worker unavailable "
          f"({why}) — using python cv2 path", file=sys.stderr)


def have_native() -> bool:
    return _load() is not None


def prep_batch(paths, flips, scales, bucket_hw, n_threads: int = 0):
    """Decode + flip + f32-resize + zero-pad ``len(paths)`` images into one
    (N, bh, bw, 3) float32 BGR blob using the C++ thread pool.

    Returns (blob, dims (N, 2) resized hw) or None when the native library
    is unavailable (caller falls back to the python path)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    bh, bw = bucket_hw
    out = np.empty((n, bh, bw, 3), np.float32)
    dims = np.zeros((n, 2), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_flips = np.ascontiguousarray(flips, np.int32)
    c_scales = np.ascontiguousarray(scales, np.float32)
    rc = lib.frcnn_prep_batch(
        c_paths, c_flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        c_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, bh, bw, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    if rc != 0:
        raise IOError(f"native prep failed to read {paths[-1 - rc]}")
    return out, dims
