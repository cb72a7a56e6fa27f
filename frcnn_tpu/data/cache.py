"""Memory-mapped decoded-image cache.

The reference's data layer re-decodes every JPEG each epoch
(``lib/roi_data_layer/minibatch.py:~L40`` ``cv2.imread`` per forward).  On a
GPU box that hides behind the 100×-slower step time; on a TPU the jitted
train step is ~27 ms while a single-core host spends ~0.5 s per batch in
decode — the input pipeline, not the device, bounds training (see
docs/PROFILE_r02.md §5).  This cache decodes each image ONCE into one flat
uint8 file plus a pickle index, then serves zero-copy ``np.memmap`` views.

Layout: ``<path>.dat`` is the concatenated raw BGR bytes of every image;
``<path>.idx`` pickles ``{image_path: (offset, h, w, c, mtime, fsize)}``.
The cache is keyed by image path and validated against each source file's
(mtime, size) when an existing cache is opened for reuse, so a stale cache
for replaced/re-exported images is rebuilt instead of silently training on
the old pixels.  Flipping is NOT cached — `get_minibatch` flips views on
the fly, matching the reference's flipped-roidb convention
(imdb.append_flipped_images doubles the roidb without duplicating files).

Enable with ``cfg.TRAIN.IMAGE_CACHE=True`` (``--set TRAIN.IMAGE_CACHE
True``); the train driver builds it under ``<DATA_DIR>/cache/`` keyed by
the imdb name (shared across experiments, like the roidb pkl caches).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle

import numpy as np


class DecodedImageCache:
    """Decode-once memmap image store.  ``reader = cache.reader`` is a
    drop-in replacement for ``cv2.imread`` (BGR uint8 out)."""

    def __init__(self, dat_path: str, index: dict):
        self._dat_path = dat_path
        self._index = index
        self._mm = np.memmap(dat_path, dtype=np.uint8, mode="r")

    # -- construction --------------------------------------------------------

    @staticmethod
    def _entry_current(path: str, entry) -> bool:
        """A cached entry is current iff the source file still has the
        (mtime, size) recorded at build time."""
        try:
            st = os.stat(path)
        except OSError:
            return False
        _, _, _, _, mtime, fsize = entry
        return st.st_mtime == mtime and st.st_size == fsize

    @classmethod
    def build(cls, image_paths, cache_prefix: str, verbose: bool = True):
        """Decode every unique path into ``<cache_prefix>.dat/.idx``.
        Reuses an existing cache only when it covers every requested path
        AND each source file is unchanged (mtime+size) since the build."""
        import cv2

        dat, idx = cache_prefix + ".dat", cache_prefix + ".idx"
        unique = list(dict.fromkeys(image_paths))
        if osp.exists(dat) and osp.exists(idx):
            with open(idx, "rb") as f:
                index = pickle.load(f)
            if all(p in index and cls._entry_current(p, index[p])
                   for p in unique):
                if verbose:
                    print(f"image cache: reusing {dat} ({len(index)} images)")
                return cls(dat, index)
            if verbose:
                print("image cache: stale or incomplete — rebuilding")
        os.makedirs(osp.dirname(osp.abspath(dat)), exist_ok=True)
        index = {}
        offset = 0
        with open(dat, "wb") as f:
            for i, p in enumerate(unique):
                im = cv2.imread(p)
                assert im is not None, f"failed to read {p}"
                im = np.ascontiguousarray(im)
                f.write(im.tobytes())
                st = os.stat(p)
                index[p] = (offset, *im.shape, st.st_mtime, st.st_size)
                offset += im.nbytes
                if verbose and (i + 1) % 500 == 0:
                    print(f"image cache: {i + 1}/{len(unique)} decoded")
        with open(idx, "wb") as f:
            pickle.dump(index, f)
        if verbose:
            print(f"image cache: built {dat} "
                  f"({len(unique)} images, {offset / 1e6:.1f} MB)")
        return cls(dat, index)

    @classmethod
    def open(cls, cache_prefix: str):
        with open(cache_prefix + ".idx", "rb") as f:
            index = pickle.load(f)
        return cls(cache_prefix + ".dat", index)

    # -- reading -------------------------------------------------------------

    def __contains__(self, path: str) -> bool:
        return path in self._index

    def reader(self, path: str) -> np.ndarray:
        """(H, W, C) uint8 BGR view of the cached decode of ``path``."""
        offset, h, w, c = self._index[path][:4]
        return self._mm[offset:offset + h * w * c].reshape(h, w, c)


class ResizedImageCache:
    """Decode+resize-once memmap store: each (path, target_scale) cached at
    its final training resolution (uint8 BGR).

    The decoded cache above still leaves a per-epoch ``cv2.resize`` on the
    single host core (~0.4 s for an 8-image 608×1024 batch — it, not the
    ~43 ms device step, bounded training).  Resizing is deterministic given
    (image dims, target size, MAX_SIZE, buckets), so cache the resized
    pixels: the steady-state host cost per image drops to a memmap view +
    pad-copy, and batches feed uint8 (cast + mean-subtract stay in-graph).

    Flip is NOT cached: horizontal flip commutes with the symmetric bilinear
    resize (asserted within 1 LSB in tests), so flipped roidb entries take a
    negative-stride view of the cached resized image.

    Entries are keyed (path, target) and record the resize scale plus the
    source (mtime, size); ``get`` revalidates the scale against the live
    config, so a cache built under different BUCKETS/MAX_SIZE is rebuilt
    rather than silently reused."""

    def __init__(self, dat_path: str, index: dict):
        self._dat_path = dat_path
        self._index = index
        self._mm = np.memmap(dat_path, dtype=np.uint8, mode="r")

    @staticmethod
    def _scale_for(h, w, target, max_size, buckets):
        from frcnn_tpu.data.loader import pick_scale_and_bucket

        return pick_scale_and_bucket(h, w, target, max_size, buckets)[0]

    @classmethod
    def build(cls, image_paths, cache_prefix: str, targets, max_size: int,
              buckets, verbose: bool = True):
        """Decode + resize every unique path at every target scale into
        ``<cache_prefix>.dat/.idx``.  Reuses an existing cache only when it
        covers every (path, target) pair, each source file is unchanged
        (mtime+size), and the recorded scales match the live
        (MAX_SIZE, BUCKETS) config."""
        import cv2

        dat, idx = cache_prefix + ".dat", cache_prefix + ".idx"
        unique = list(dict.fromkeys(image_paths))
        targets = tuple(dict.fromkeys(targets))

        def entry_current(p, t, entry):
            offset, sh, sw, h, w, scale, mtime, fsize = entry
            try:
                st = os.stat(p)
            except OSError:
                return False
            return (st.st_mtime == mtime and st.st_size == fsize
                    and scale == cls._scale_for(h, w, t, max_size, buckets))

        if osp.exists(dat) and osp.exists(idx):
            with open(idx, "rb") as f:
                index = pickle.load(f)
            if all((p, t) in index and entry_current(p, t, index[(p, t)])
                   for p in unique for t in targets):
                if verbose:
                    print(f"resized-image cache: reusing {dat} "
                          f"({len(index)} entries)")
                return cls(dat, index)
            if verbose:
                print("resized-image cache: stale or incomplete — rebuilding")
        os.makedirs(osp.dirname(osp.abspath(dat)), exist_ok=True)
        index = {}
        offset = 0
        with open(dat, "wb") as f:
            for i, p in enumerate(unique):
                im = cv2.imread(p)
                assert im is not None, f"failed to read {p}"
                h, w = im.shape[:2]
                st = os.stat(p)
                for t in targets:
                    scale = cls._scale_for(h, w, t, max_size, buckets)
                    r = np.ascontiguousarray(cv2.resize(
                        im, None, None, fx=scale, fy=scale,
                        interpolation=cv2.INTER_LINEAR))
                    f.write(r.tobytes())
                    index[(p, t)] = (offset, r.shape[0], r.shape[1], h, w,
                                     scale, st.st_mtime, st.st_size)
                    offset += r.nbytes
                if verbose and (i + 1) % 500 == 0:
                    print(f"resized-image cache: {i + 1}/{len(unique)}")
        with open(idx, "wb") as f:
            pickle.dump(index, f)
        if verbose:
            print(f"resized-image cache: built {dat} ({len(unique)} images x "
                  f"{len(targets)} scales, {offset / 1e6:.1f} MB)")
        return cls(dat, index)

    @classmethod
    def open(cls, cache_prefix: str):
        with open(cache_prefix + ".idx", "rb") as f:
            index = pickle.load(f)
        return cls(cache_prefix + ".dat", index)

    def get(self, path: str, target, max_size: int, buckets):
        """(resized uint8 BGR view (sh, sw, 3), scale) — or None when the
        entry is absent or its scale disagrees with the live config."""
        entry = self._index.get((path, target))
        if entry is None:
            return None
        offset, sh, sw, h, w, scale, _, _ = entry
        if scale != self._scale_for(h, w, target, max_size, buckets):
            return None
        return (self._mm[offset:offset + sh * sw * 3].reshape(sh, sw, 3),
                scale)
