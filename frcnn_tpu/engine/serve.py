"""Data-parallel serving (BASELINE.json config 5: "Data-parallel COCO-scale
serving on v5e-8 with fused NMS/RoIAlign at batch 64").

The reference has no serving story (single-image demo.py); this is new
capability: a Detector that jits the fused detect pipeline once per bucket
shape and shards request batches over a 1-D data mesh — on v5e-8 a batch of
64 runs 8 images/chip with zero cross-chip communication (detection is
embarrassingly data-parallel; the mesh buys linear throughput).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from frcnn_tpu.config import Config
from frcnn_tpu.data.loader import prep_im_for_blob
from frcnn_tpu.models.backbones import pack_images


class Detector:
    """Batched, optionally multi-chip detection service.

    Usage:
        det = Detector(model, variables, cfg, mesh=make_mesh(8))
        results = det(list_of_bgr_images)   # list of (k, 6) arrays
    """

    def __init__(self, model, variables, cfg: Config | None = None, mesh=None,
                 max_per_image: int | None = None, uint8_input: bool = False):
        self.model = model
        self.cfg = cfg or model.config
        self.mesh = mesh
        self.max_per_image = max_per_image or self.cfg.TEST.MAX_PER_IMAGE
        # uint8_input: resize/pad/ship uint8 instead of f32 — 4x less
        # host->device traffic, pixels within 1 LSB of the reference-exact
        # f32 resize (cast + mean-subtract are in-graph either way)
        self.uint8_input = uint8_input
        self._detect = jax.jit(partial(model.apply, method="detect"))
        if mesh is not None:
            from frcnn_tpu.parallel.mesh import replicate

            variables = replicate(variables, mesh)
        self.variables = variables
        self.n_devices = 1 if mesh is None else mesh.devices.size

    def _prep_groups(self, images):
        """Preprocess and group by assigned bucket: one batch must never mix
        bucket shapes (multi-bucket configs, e.g. landscape + portrait).
        Returns {bucket_hw: [(orig_idx, blob, info), ...]}."""
        groups: dict = {}
        for i, im in enumerate(images):
            blob, scale = prep_im_for_blob(im, self.cfg.TEST.SCALES[0],
                                           self.cfg.TEST.MAX_SIZE,
                                           self.cfg.TPU.BUCKETS,
                                           keep_uint8=self.uint8_input)
            h, w = im.shape[:2]
            info = [np.round(h * scale), np.round(w * scale), scale]
            groups.setdefault(blob.shape[:2], []).append((i, blob, info))
        return groups

    def detect_blobs(self, data, im_info):
        """Raw fixed-shape entry: data (B, bh, bw, 3), im_info (B, 3).
        B must be a multiple of the mesh size."""
        if isinstance(data, np.ndarray):  # device arrays are already packed
            data = pack_images(data, getattr(self.model, "input_block", 1))
        if self.mesh is not None:
            from frcnn_tpu.parallel.mesh import shard_batch

            data, im_info = shard_batch((data, im_info), self.mesh)
        return self._detect(self.variables, data, im_info)

    def __call__(self, images):
        """images: list of BGR uint8 arrays → list of (k, 6) float arrays
        [x1, y1, x2, y2, score, class] in original image coordinates.

        All bucket groups are dispatched before the first readback: jax
        dispatch is async, so the device works on group k while the host
        stacks/pads group k+1, and the readbacks at the end drain in order.
        """
        results = [None] * len(images)
        launched = []
        for _, items in self._prep_groups(images).items():
            pad = (-len(items)) % self.n_devices
            data = np.stack([b for _, b, _ in items]
                            + [items[-1][1]] * pad)
            im_info = np.asarray([f for _, _, f in items]
                                 + [items[-1][2]] * pad, np.float32)
            launched.append((items, self.detect_blobs(data, im_info)))
        for items, (dets, valid) in launched:
            dets, valid = np.asarray(dets), np.asarray(valid)
            for bi, (i, _, _) in enumerate(items):
                results[i] = dets[bi][valid[bi]]
        return results


def throughput(detector: Detector, batch: int, iters: int = 20,
               warmup: int = 2) -> float:
    """Steady-state images/sec of the fused pipeline on synthetic data.

    Timing: iterations are serialized by a data dependency (a scalar*0 of
    the previous detections folded into im_info) and the chain ends with one
    host readback — jax.block_until_ready does not reliably wait on the
    axon-tunneled TPU backend, so only a readback proves completion."""
    import time

    import jax.numpy as jnp

    h, w = detector.cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    data = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    im_info = np.asarray(
        np.tile(np.asarray([[h, w, 1.0]], np.float32), (batch, 1)))

    def step(x_info):
        det, valid = detector.detect_blobs(data, x_info)
        return x_info + jnp.sum(det[:, 0, 0]) * 0.0, det

    x_info = jnp.asarray(im_info)
    for _ in range(warmup):
        x_info, det = step(x_info)
    _ = np.asarray(det[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x_info, det = step(x_info)
    _ = np.asarray(det[0, 0])
    return batch * iters / (time.perf_counter() - t0)
