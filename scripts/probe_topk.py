#!/usr/bin/env python
"""Decompose the FPN per-level top-k cost on hardware: where do the ~2 ms go
and which selection formulation is fastest?

Arms (L2 train shape (8, 116736), k=2000 unless noted):
  sort_full        lax.sort of the row (upper bound)
  topk_direct      lax.top_k(x, 2000)
  topk_small_k     lax.top_k(x, 48)  — is XLA TopK cost k-dependent at all?
  transpose_only   the (B, S, G)→(B, G, S) strided relayout alone
  topk_blocks      lax.top_k over (8, 128, 912), k=48 (no transpose)
  topk_strided     full ops.select.topk_strided (transpose + 2 stages + case)
  topk_union       stage-2 style: lax.top_k(2000) over (8, 6144)

Usage: python scripts/probe_topk.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_backbone import slope_time


def main():
    from frcnn_tpu.ops.select import topk_strided

    b, kk, k = 8, 116736, 2000
    g = 128
    s = -(-kk // g)       # 912
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, kk).astype(np.float32))
    xp = jnp.asarray(rng.rand(b, g * s).astype(np.float32))
    xb = xp.reshape(b, g, s)
    xu = jnp.asarray(rng.rand(b, g * 48).astype(np.float32))
    print(f"backend={jax.default_backend()} shape=({b},{kk}) k={k} "
          f"blocks=({g},{s})")

    def report(name, fn, args):
        dt = slope_time(fn, args)
        print(f"{name:16s}: {dt*1e3:7.3f} ms")

    report("sort_full", lambda v: jnp.sum(jax.lax.sort(v)[..., -1]), (x,))
    report("topk_direct",
           lambda v: jnp.sum(jax.lax.top_k(v, k)[0][..., -1]), (x,))
    report("topk_small_k",
           lambda v: jnp.sum(jax.lax.top_k(v, 48)[0][..., -1]), (x,))
    report("transpose_only",
           lambda v: jnp.sum(v.reshape(b, s, g).transpose(0, 2, 1)
                             [..., -1]), (xp,))
    report("topk_blocks",
           lambda v: jnp.sum(jax.lax.top_k(v, 48)[0][..., -1]), (xb,))
    report("topk_union",
           lambda v: jnp.sum(jax.lax.top_k(v, k)[0][..., -1]), (xu,))
    report("topk_strided",
           lambda v: jnp.sum(topk_strided(v, k)[0][..., -1]), (x,))


if __name__ == "__main__":
    main()
