"""Exact top-k selection kernels for the proposal layers.

TPU-native replacement for the reference's score sort in the proposal
layer (``lib/layer_utils/proposal_layer.py:~L20-L80`` sorts all anchor
scores; SURVEY.md #13).  ``jax.lax.top_k`` at k≈2000 over the ~117k-row
FPN anchor concat costs ~2 ms/step at the train shape (PROFILE_r03 §3):
XLA's TopK does sort-network work proportional to k over the whole input.

``topk_strided`` cuts that by a two-stage *exact* decomposition:

  1. view the row as G strided blocks (block g = lanes ``idx % G == g``) and
     take a small per-block top-m — XLA TopK over (..., G, S) with m ≪ k;
  2. re-rank the G·m union with one small top-k;
  3. the result equals a direct top-k UNLESS some block had all m of its
     winners selected (it might have held more) — detected exactly from the
     selected union positions, and repaired by a ``lax.cond`` fallback to
     the direct ``jax.lax.top_k`` (rare: blocks are STRIDED, so spatially
     clustered high scores — objects light up runs of consecutive anchors —
     spread round-robin across blocks instead of saturating one).

Tie-breaking: values descending, then *strided-block-major* index order —
for equal values in different blocks the lower ``idx % G`` wins, whereas
``jax.lax.top_k`` prefers the lower index outright.  Exact value-ties at
the selection cut are measure-zero for sigmoid scores; callers that need
lax.top_k's literal tie order must not use this.

STATUS (2026-08-20): measured 0.98 → 0.55 ms at the FPN L2 train shape and
oracle-exact in every CPU test, but NOT wired into production — the axon
TPU backend mis-executes programs holding these strided top-k graphs
(`INVALID_ARGUMENT` on repeat or second-in-process executions, reproduced
5x including the real 800×1216 FPN detect; the same programs with plain
``lax.top_k`` run clean — PROFILE_r04 §2).

STATUS UPDATE (2026-08-21, round 5): the backend bug no longer reproduces
— scripts/repro_axon/repro_strided_topk.py prints CLEAN, and a hardened
3-program × 4-interleaved-repeat run is also clean (PROFILE_r05 §7).  It
stays unwired anyway, for a better reason now: the same backend update
made ``lax.top_k`` ~4x faster at small rows (PROFILE_r05 §3), so at the
shapes where selection still costs real time the exact-tie-order
threshold kernel (ops/pallas/select_kernel.py) already wins, and this
kernel's block-major tie order remains wrong for the production call
sites that require lax.top_k order parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("k", "num_blocks", "m", "fallback"))
def topk_strided(x, k: int, num_blocks: int = 128, m: int | None = None,
                 fallback: bool = True):
    """Exact top-k over the last axis of ``x`` (B, K) → (values, indices)
    each (B, k), values descending.  See module docstring for the tie-order
    caveat and the saturation fallback.

    m: per-block take (default: smallest multiple of 8 ≥ 2·k/num_blocks+16,
    clipped to the block length) — the fallback fires only when some block
    holds ≥ m of the global top-k, so m trades stage-1 work against
    fallback probability.

    fallback=False skips the saturation repair — for callers under vmap
    (where lax.cond degrades to running BOTH branches) whose inputs make
    saturation statistically impossible, e.g. iid random sampling
    priorities with tie-free fillers (mean winners/block = k/num_blocks,
    so P(some block ≥ m) is astronomically small for m ≫ k/num_blocks).
    The result is then top-k conditional on no block saturating."""
    b, kk = x.shape
    g = num_blocks
    s = -(-kk // g)                      # block length (ceil)
    if m is None:
        m = min(s, -(-(2 * k // g + 16) // 8) * 8)
    m = min(max(m, 1), s)
    if g * m < k or kk <= 2 * g * m:
        # decomposition cannot cover k, or the union wouldn't shrink the
        # problem at least 2x (measured: XLA TopK cost is ~k-independent,
        # so a marginal shrink loses to the two-stage overhead) — direct
        return jax.lax.top_k(x, k)

    pad = g * s - kk
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=NEG_INF)
    # strided blocks: element idx lives in block idx % g at offset idx // g
    xt = xp.reshape(b, s, g).transpose(0, 2, 1)          # (B, G, S)
    bv, bi = jax.lax.top_k(xt, m)                        # (B, G, m)
    blk = jax.lax.broadcasted_iota(jnp.int32, (b, g, m), 1)
    gidx = bi * g + blk                                  # global indices
    uv = bv.reshape(b, g * m)
    ui = gidx.reshape(b, g * m)
    fv, fp = jax.lax.top_k(uv, k)                        # fp: union positions
    fi = jnp.take_along_axis(ui, fp, axis=1)
    if not fallback:
        return fv, fi

    # exactness check: a block with all m winners selected may have held
    # more of the true top-k than stage 1 kept
    sel_blk = fp // m                                    # (B, k)
    counts = jnp.sum(
        sel_blk[..., None] == jnp.arange(g, dtype=sel_blk.dtype), axis=1)
    ok = jnp.all(counts < m)
    return jax.lax.cond(ok,
                        lambda: (fv, fi),
                        lambda: tuple(jax.lax.top_k(x, k)))
