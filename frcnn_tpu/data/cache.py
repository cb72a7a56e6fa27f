"""Memory-mapped decoded-image cache.

The reference's data layer re-decodes every JPEG each epoch
(``lib/roi_data_layer/minibatch.py:~L40`` ``cv2.imread`` per forward).  On a
GPU box that hides behind the 100×-slower step time; on a TPU the jitted
train step is ~27 ms while a single-core host spends ~0.5 s per batch in
decode — the input pipeline, not the device, bounds training (see
docs/PROFILE_r02.md §5).  This cache decodes each image ONCE into one flat
uint8 file plus a pickle index, then serves zero-copy ``np.memmap`` views.

Layout: ``<path>.dat`` is the concatenated raw BGR bytes of every image;
``<path>.idx`` pickles ``{image_path: (offset, h, w, c)}``.  The cache is
keyed by image path and validated by (h, w) on read, so a stale cache for
changed-size images fails loudly instead of silently training on the wrong
pixels.  Flipping is NOT cached — `get_minibatch` flips views on the fly,
matching the reference's flipped-roidb convention (imdb.append_flipped_images
doubles the roidb without duplicating files).

Enable with ``cfg.TRAIN.IMAGE_CACHE=True`` (``--set TRAIN.IMAGE_CACHE
True``); the train driver builds it next to the experiment output dir on
first use.
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

    @classmethod
    def build(cls, image_paths, cache_prefix: str, verbose: bool = True):
        """Decode every unique path into ``<cache_prefix>.dat/.idx``.
        Skips the build when a complete cache already exists."""
        import cv2

        dat, idx = cache_prefix + ".dat", cache_prefix + ".idx"
        unique = list(dict.fromkeys(image_paths))
        if osp.exists(dat) and osp.exists(idx):
            with open(idx, "rb") as f:
                index = pickle.load(f)
            if all(p in index for p in unique):
                if verbose:
                    print(f"image cache: reusing {dat} ({len(index)} images)")
                return cls(dat, index)
        os.makedirs(osp.dirname(osp.abspath(dat)), exist_ok=True)
        index = {}
        offset = 0
        with open(dat, "wb") as f:
            for i, p in enumerate(unique):
                im = cv2.imread(p)
                assert im is not None, f"failed to read {p}"
                im = np.ascontiguousarray(im)
                f.write(im.tobytes())
                index[p] = (offset, *im.shape)
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
        offset, h, w, c = self._index[path]
        return self._mm[offset:offset + h * w * c].reshape(h, w, c)
