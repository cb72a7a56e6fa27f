"""Minibatch loading: RoIDataLayer + blob assembly.

Rebuild of reference ``lib/roi_data_layer/{layer,minibatch}.py`` and
``lib/utils/blob.py`` (SURVEY.md #29/#30/#32) with fixed-shape TPU output:

  * host side does ONLY JPEG decode (cv2, BGR like the reference), optional
    horizontal flip, aspect-preserving resize (shorter side → SCALES,
    longer side capped at MAX_SIZE), and zero-padding into a static bucket
    from cfg.TPU.BUCKETS — mean subtraction moved in-graph
    (FasterRCNN._preprocess), per BASELINE.json "preprocessing fuses into
    the XLA graph";
  * gt boxes are scaled and padded to cfg.TPU.MAX_GT with a validity mask
    (the reference emits variable (G, 5) gt_boxes);
  * unlike the reference's asserted 1-image batches, any batch size works —
    all images of a batch share one bucket shape.

RoIDataLayer keeps the reference's epoch-less shuffled-permutation cursor
(``_cur``/``_perm``), including ASPECT_GROUPING and the get/set_state hook
that snapshots capture for bit-exact resume (reference SolverWrapper
snapshot contract, SURVEY.md §3.4).
"""

from __future__ import annotations

import numpy as np

from frcnn_tpu.config import Config


def pick_scale_and_bucket(h: int, w: int, target_size: int, max_size: int, buckets):
    """Resize factor (reference prep_im_for_blob math) + smallest bucket that
    holds the scaled image.  Falls back to the largest bucket with a reduced
    scale if none fits."""
    im_size_min = min(h, w)
    im_size_max = max(h, w)
    scale = float(target_size) / float(im_size_min)
    if np.round(scale * im_size_max) > max_size:
        scale = float(max_size) / float(im_size_max)
    sh, sw = int(np.round(h * scale)), int(np.round(w * scale))
    for bh, bw in sorted(buckets, key=lambda b: b[0] * b[1]):
        if sh <= bh and sw <= bw:
            return scale, (bh, bw)
    # no bucket fits: pick the bucket that loses the least resolution (NOT
    # the largest-area one — for a portrait image that would select a
    # landscape bucket and shrink ~2x more than its transpose)
    bh, bw = max(buckets, key=lambda b: min(b[0] / sh, b[1] / sw))
    shrink = min(bh / sh, bw / sw)
    return scale * shrink, (bh, bw)


def snap_to_bucket(hws, buckets):
    """Smallest configured bucket covering the componentwise max of the given
    (h, w) shapes.  When one batch mixes orientations (e.g. a (608, 1024)
    image next to a (1024, 608) one) no single configured bucket covers both;
    fall back to the componentwise max over all buckets — the implicit
    'union' bucket — so the batch still has one static shape drawn from a
    finite set (ASPECT_GROUPING keeps this fallback rare in training)."""
    need_h = max(h for h, _ in hws)
    need_w = max(w for _, w in hws)
    fitting = [b for b in buckets if b[0] >= need_h and b[1] >= need_w]
    if fitting:
        return min(fitting, key=lambda b: (b[0] * b[1], b))
    return (max(b[0] for b in buckets), max(b[1] for b in buckets))


def prep_im_for_blob(im, target_size: int, max_size: int, buckets,
                     keep_uint8: bool = False):
    """Resize into a bucket.  Returns (padded_im (bh, bw, 3) BGR raw pixels,
    scale).  Reference prep_im_for_blob also mean-subtracts; ours is
    in-graph.  Default float32 resize is reference-exact; ``keep_uint8``
    resizes/pads in uint8 (≤1 LSB pixel difference) — the cast then happens
    in-graph and host→device transfer shrinks 4×."""
    import cv2

    h, w = im.shape[:2]
    scale, (bh, bw) = pick_scale_and_bucket(h, w, target_size, max_size, buckets)
    src = im if keep_uint8 and im.dtype == np.uint8 else im.astype(np.float32)
    resized = cv2.resize(src, None, None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_LINEAR)
    out = np.zeros((bh, bw, 3), dtype=src.dtype)
    rh, rw = min(resized.shape[0], bh), min(resized.shape[1], bw)
    out[:rh, :rw, :] = resized[:bh, :bw]
    return out, scale


def im_list_to_blob(ims):
    """Pad a list of (H, W, 3) images to their max shape (reference
    im_list_to_blob; kept for parity/tools use)."""
    max_shape = np.array([im.shape for im in ims]).max(axis=0)
    blob = np.zeros((len(ims), max_shape[0], max_shape[1], 3), dtype=np.float32)
    for i, im in enumerate(ims):
        blob[i, : im.shape[0], : im.shape[1], :] = im
    return blob


def get_minibatch(roidb, cfg: Config, rng: np.random.RandomState | None = None,
                  reader=None):
    """Build one fixed-shape minibatch from roidb entries.

    Returns dict: data (B, bh, bw, 3) raw BGR — f32 from the decode paths,
    uint8 from the resized cache (cast is in-graph either way); im_info
    (B, 3) [h, w, scale] of the *scaled, unpadded* image; gt_boxes
    (B, MAX_GT, 4) scaled; gt_labels (B, MAX_GT) int32; gt_valid (B, MAX_GT)
    bool.

    ``reader`` optionally replaces cv2.imread (→ BGR uint8), e.g.
    ``DecodedImageCache.reader`` to skip per-epoch JPEG decode — or a
    ``ResizedImageCache`` instance to skip the per-epoch resize too.
    """
    import cv2

    rng = rng or np.random
    t = cfg.TRAIN
    buckets = cfg.TPU.BUCKETS
    max_gt = cfg.TPU.MAX_GT

    # per-image scale sampled from cfg.TRAIN.SCALES (reference minibatch.py
    # samples npr.randint per image the same way)
    targets = [t.SCALES[rng.randint(0, len(t.SCALES))] if len(t.SCALES) > 1
               else t.SCALES[0] for _ in roidb]

    images, infos, gtb, gtl, gtv = [], [], [], [], []
    entry_dims, scales = [], []

    # Resized-cache path: pixels already stored at their final scale (uint8)
    # — host work per image is a (flip-)view + pad-copy, and the batch feeds
    # uint8 (cast + mean-subtract are in-graph, models.backbones
    # .preprocess_images).  Falls through to the decode paths below when an
    # entry is missing or was built under a different resize config.
    from frcnn_tpu.data.cache import ResizedImageCache

    if isinstance(reader, ResizedImageCache) \
            and all("width" in e and "height" in e for e in roidb):
        got = [reader.get(e["image"], tg, t.MAX_SIZE, buckets)
               for e, tg in zip(roidb, targets)]
        if all(g is not None for g in got):
            scales = [g[1] for g in got]
            entry_dims = [(e["height"], e["width"]) for e in roidb]
            bucket_hw = snap_to_bucket([g[0].shape[:2] for g in got], buckets)
            bh, bw = bucket_hw
            for e, (im, _) in zip(roidb, got):
                if e.get("flipped", False):
                    im = im[:, ::-1]
                blob = np.zeros((bh, bw, 3), np.uint8)
                blob[: min(im.shape[0], bh), : min(im.shape[1], bw)] = \
                    im[:bh, :bw]
                images.append(blob)
        reader = None  # cache miss → plain decode below, not a callable

    # Native threaded path (decode+flip+resize+pad in C++, pixel-equal
    # within <=1e-4 — see native/data_prep.cc): possible when no cache
    # reader overrides the decode and the entries carry their stored dims
    # (scale and bucket choice then need no pixels).
    native_ok = (not images and reader is None and t.NATIVE_PREP
                 and all("width" in e and "height" in e for e in roidb))
    if native_ok:
        from frcnn_tpu.native import data_prep

        per_bucket = []
        for entry, target in zip(roidb, targets):
            scale, bkt = pick_scale_and_bucket(
                entry["height"], entry["width"], target, t.MAX_SIZE, buckets)
            scales.append(scale)
            per_bucket.append(bkt)
            entry_dims.append((entry["height"], entry["width"]))
        bucket_hw = snap_to_bucket(per_bucket, buckets)
        res = data_prep.prep_batch(
            [e["image"] for e in roidb],
            [1 if e.get("flipped", False) else 0 for e in roidb],
            scales, bucket_hw)
        if res is not None:
            images = list(res[0])
        else:
            native_ok = False  # library unavailable → python path below
            entry_dims, scales = [], []

    if not images and not native_ok:
        prepped = []
        for entry, target in zip(roidb, targets):
            im = (reader or cv2.imread)(entry["image"])
            assert im is not None, f"failed to read {entry['image']}"
            if entry.get("flipped", False):
                im = im[:, ::-1, :]
            padded, scale = prep_im_for_blob(im, target, t.MAX_SIZE, buckets)
            prepped.append((im.shape[:2], padded))
            scales.append(scale)
            entry_dims.append(im.shape[:2])
        # all images of the batch share one static shape: the smallest
        # bucket covering every per-image bucket (componentwise, NOT
        # lexicographic max)
        bucket_hw = snap_to_bucket([p[1].shape[:2] for p in prepped], buckets)
        for (h, w), padded in prepped:
            if padded.shape[:2] != bucket_hw:  # re-pad smaller buckets up
                up = np.zeros(bucket_hw + (3,), dtype=np.float32)
                up[: padded.shape[0], : padded.shape[1]] = padded
                padded = up
            images.append(padded)

    for (h, w), scale in zip(entry_dims, scales):
        infos.append([np.round(h * scale), np.round(w * scale), scale])

    for entry, scale in zip(roidb, scales):
        gt_inds = np.where(entry["gt_classes"] > 0)[0] \
            if "gt_classes" in entry else np.arange(len(entry["boxes"]))
        boxes = entry["boxes"][gt_inds].astype(np.float32) * scale
        labels = (entry["gt_classes"][gt_inds] if "gt_classes" in entry
                  else np.ones(len(gt_inds))).astype(np.int32)
        n = min(len(boxes), max_gt)
        b = np.zeros((max_gt, 4), np.float32)
        l = np.zeros((max_gt,), np.int32)
        v = np.zeros((max_gt,), bool)
        b[:n] = boxes[:n]
        l[:n] = labels[:n]
        v[:n] = True
        gtb.append(b)
        gtl.append(l)
        gtv.append(v)

    return {
        "data": np.stack(images),
        "im_info": np.asarray(infos, np.float32),
        "gt_boxes": np.stack(gtb),
        "gt_labels": np.stack(gtl),
        "gt_valid": np.stack(gtv),
    }


class RoIDataLayer:
    """Epoch-less minibatch iterator (reference lib/roi_data_layer/layer.py).

    Shuffled permutation with optional aspect grouping; the cursor/permutation
    are snapshot state (reference saves _cur/_perm + numpy RNG into the .pkl
    beside each .pth — SURVEY.md §3.4)."""

    def __init__(self, roidb, cfg: Config, random: bool = False,
                 batch_size: int | None = None, reader=None):
        self._roidb = roidb
        self._cfg = cfg
        self._random = random
        self._batch = batch_size or cfg.TRAIN.IMS_PER_BATCH
        self._reader = reader  # optional DecodedImageCache.reader
        self._rng = np.random.RandomState(cfg.RNG_SEED)
        self._shuffle_roidb_inds()

    def _shuffle_roidb_inds(self):
        if self._random:  # reference uses time-seeded randomness for val
            self._rng = np.random.RandomState(np.random.randint(0, 2**31 - 1))
        # Orientation grouping: the reference pairs portrait/landscape images
        # under ASPECT_GROUPING (its batches are <= 2 images).  With B-image
        # batches and both bucket orientations configured, a mixed batch
        # snaps to the oversized union bucket (snap_to_bucket fallback) —
        # at B=8 and ~1/3 portrait images that would be ~96% of batches —
        # so whole-batch grouping auto-activates in that beyond-reference
        # regime even when ASPECT_GROUPING is off.
        group = self._cfg.TRAIN.ASPECT_GROUPING or (
            self._batch > 1 and len(self._cfg.TPU.BUCKETS) > 1)
        if group and len(self._roidb) > 0:
            widths = np.array([r["width"] for r in self._roidb])
            heights = np.array([r["height"] for r in self._roidb])
            horz = widths >= heights
            b = self._batch
            groups = []
            partial = []
            for inds in (np.where(horz)[0], np.where(~horz)[0]):
                inds = self._rng.permutation(inds)
                for i in range(0, len(inds), b):
                    g = inds[i:i + b]
                    (groups if len(g) == b else partial).append(g)
            order = self._rng.permutation(len(groups))
            # full orientation-pure groups first (batch slices stay aligned
            # to the stride-b cursor); the <= 2 partial tails go last
            self._perm = np.concatenate(
                [groups[i] for i in order] + partial) if groups or partial \
                else np.arange(0)
        else:
            self._perm = self._rng.permutation(len(self._roidb))
        self._cur = 0

    def _get_next_minibatch_inds(self):
        if self._cur + self._batch > len(self._roidb):
            self._shuffle_roidb_inds()
        if self._batch <= len(self._roidb):
            inds = self._perm[self._cur : self._cur + self._batch]
            self._cur += self._batch
            return inds
        # roidb smaller than the batch (tiny debug sets, large
        # IMS_PER_BATCH): chain whole permutations until the batch fills —
        # a short batch would break the fixed-shape graph and the
        # batch-divides-mesh contract.  All randomness flows through
        # self._rng, so get/set_state still resumes bit-exactly.
        out = list(self._perm)
        while len(out) < self._batch:
            self._shuffle_roidb_inds()
            out.extend(self._perm)
        self._cur = len(self._roidb)  # consumed: force reshuffle next call
        return np.asarray(out[: self._batch])

    def forward(self):
        inds = self._get_next_minibatch_inds()
        return get_minibatch([self._roidb[i] for i in inds], self._cfg,
                             self._rng, reader=self._reader)

    # -- snapshot state (reference SolverWrapper.snapshot saves these) -------
    def get_state(self):
        return {"cur": self._cur, "perm": np.asarray(self._perm),
                "rng": self._rng.get_state()}

    def set_state(self, state):
        self._cur = int(state["cur"])
        self._perm = np.asarray(state["perm"])
        self._rng.set_state(state["rng"])
