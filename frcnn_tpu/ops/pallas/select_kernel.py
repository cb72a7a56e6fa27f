"""Pallas TPU exact top-k by threshold (radix-select) for the proposal layers.

TPU-native replacement for the proposal layer's pre-NMS score selection
(``lib/layer_utils/proposal_layer.py:~L20-L80`` sorts all anchor scores and
keeps RPN_PRE_NMS_TOP_N; SURVEY.md #13).  ``jax.lax.top_k`` on this backend
costs ~a full sort of the row regardless of k (measured: k=48 is *slower*
than k=2000 on a 116k row — PROFILE_r04 §2), so selecting 2000 of ~117-182k
FPN anchor scores burns ~1-2 ms/level at production shapes.  The XLA-level
two-stage decomposition (``ops/select.topk_strided``) measured 1.8x faster
but the axon backend mis-executes its strided multi-TopK graphs
(PROFILE_r04 §2) — this kernel is the Mosaic-compiled answer that avoids
XLA TopK entirely.

Contract: ``topk_threshold(scores (B, S) f32, k)`` returns
``(values (B, k) f32, indices (B, k) int32)`` — the EXACT top-k *set* of
``lax.top_k`` including its tie rule (for equal values at the cut, lower
index wins), but in **index-ascending order**, not score-descending.  The
FPN propose path re-ranks the cross-level concat with one small top-k
anyway, so per-level order is irrelevant there; callers that need
score-descending order must re-rank.  NaN scores are unsupported
(detector scores are sigmoids); ±inf and every finite float are fine.

Algorithm (two kernels, both O(S) work, no sort anywhere):

  Phase A (``_thresh_kernel``): map scores to order-preserving int32 keys
  (host-side elementwise; sign-fixup of the raw float bits), then binary
  search the 31 value bits for the k-th largest key T: 31 masked-count
  reductions over the VMEM-resident row.  Afterwards count per C-lane
  block the strict survivors (key > T) and threshold ties (key == T) and
  turn both into exclusive running prefixes with one triangular matmul.
  Outputs per row: T, r = k - count(key > T) (how many ties to keep), and
  the two per-block prefix tables.

  Phase B (``_extract_kernel``): walk the blocks in index order (fori, the
  row stays VMEM-resident).  A block's selected lanes are
  ``strict | (tie & (tie_prefix < r))`` — globally exactly k lanes.  Their
  within-block output slots come from an exclusive-cumsum-by-triangular-
  matmul; adding the block's global base offset (phase-A prefixes, read
  from SMEM) and splitting it into an aligned 128-lane tile base plus an
  in-tile shift turns compaction into one (C, C+128) one-hot matmul and a
  single lane-aligned merged store (survivors are packed contiguously, so
  a later block only ever overwrites an earlier block's empty padding —
  empties are 0, real entries carry index+1).

Cost at the FPN detect P2 shape (8 x 182k, k=2000): ~31 VMEM passes for
the search + one one-hot build/matmul per 512-lane block — measured
on-chip in PROFILE_r04 §4 vs ~1.5-2 ms for ``lax.top_k``.

Exactness is structural (integer compares on keys computed once), not
probabilistic: there is no saturation case and no fallback branch — the
two properties the strided XLA decomposition could not give us.
Oracle-tested against stable-argsort in tests/test_select_kernel.py
(interpret mode on CPU; compiled + repeat-executed on TPU under
FRCNN_TPU_TEST_TPU=1 — repeat execution is exactly where the backend
broke the strided build).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 512          # lanes per block (compaction granularity)
SPAN = C + 128   # one-hot width: block survivors + worst-case in-tile shift
INT_MIN = -2147483648  # python int: jnp scalars would be captured consts


def _sortable_keys(scores):
    """Order-preserving f32 -> int32 map: for non-negative floats the raw
    bits already sort; negative floats sort reversed, fixed by XOR with
    0x7fffffff.  (-0.0 maps below +0.0 — consistent, since -0.0 == 0.0
    score ties cannot arise from distinct detector scores.)  Padding uses
    INT_MIN, which no non-NaN float maps to (only the NaN pattern
    0xffffffff would), so pads never tie with real entries."""
    u = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32)
    return jnp.where(u < 0, u ^ jnp.int32(0x7FFFFFFF), u)


def _thresh_kernel(keys_ref, meta_ref, ps_ref, pt_ref, *, k, n_blocks):
    keys = keys_ref[0]                          # (nB, C) i32
    nb = n_blocks

    def count_ge(t):
        return jnp.sum((keys >= t).astype(jnp.int32))

    # sign bit first (INT_MIN | value-bits never overflows afterwards)
    t0 = jnp.where(count_ge(jnp.int32(0)) >= k, 0, INT_MIN).astype(jnp.int32)

    def bit_step(i, t):
        bit = jax.lax.shift_left(jnp.int32(1), jnp.int32(30) - i)
        cand = jnp.bitwise_or(t, bit)
        return jnp.where(count_ge(cand) >= k, cand, t)

    t = jax.lax.fori_loop(0, 31, bit_step, t0)

    strict = (keys > t).astype(jnp.float32)     # (nB, C)
    tie = (keys == t).astype(jnp.float32)
    count_gt = jnp.sum(strict).astype(jnp.int32)
    r = k - count_gt

    # per-block counts -> exclusive prefixes: P[i] = sum_{j<i} counts[j],
    # one matmul with the transposed-triangular constant (GT[i,j] = j < i)
    cs = jnp.sum(strict, axis=1, keepdims=True)  # (nB, 1) f32, counts <= C
    ct = jnp.sum(tie, axis=1, keepdims=True)
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    gt_mat = (bj < bi).astype(jnp.float32)
    ps = jax.lax.dot(gt_mat, cs, preferred_element_type=jnp.float32)
    pt = jax.lax.dot(gt_mat, ct, preferred_element_type=jnp.float32)

    mi = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    meta_ref[:, :] = jnp.where(mi == 0, t, jnp.where(mi == 1, r, 0))
    ps_ref[0] = ps.astype(jnp.int32)
    pt_ref[0] = pt.astype(jnp.int32)


def _extract_kernel(keys_ref, meta_ref, ps_ref, pt_ref, lt_ref, out_ref, *,
                    n_blocks):
    t = meta_ref[0, 0]
    r = meta_ref[0, 1]
    out_ref[0] = jnp.zeros_like(out_ref[0])
    col = jax.lax.broadcasted_iota(jnp.int32, (C, SPAN), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    r_f = r.astype(jnp.float32)

    def block(g, carry):
        kb = keys_ref[0, pl.ds(g, 1), :]                 # (1, C) i32
        strict = kb > t
        tie = kb == t
        ps_g = ps_ref[0, g, 0]                           # scalars (SMEM)
        pt_g = pt_ref[0, g, 0]
        tie_f = tie.astype(jnp.float32)
        # exclusive in-block tie count (counts <= C: f32-exact)
        tie_ex = jax.lax.dot(tie_f, lt_ref[:, :],
                             preferred_element_type=jnp.float32)  # (1, C)
        sel = strict | (tie & (pt_g.astype(jnp.float32) + tie_ex < r_f))
        sel_f = sel.astype(jnp.float32)
        sel_ex = jax.lax.dot(sel_f, lt_ref[:, :],
                             preferred_element_type=jnp.float32)  # (1, C)

        base = ps_g + jnp.minimum(pt_g, r)               # global output slot
        row0 = jax.lax.shift_right_logical(base, 7)      # 128-slot output row
        shift = base - jax.lax.shift_left(row0, 7)
        # one-hot: survivor at lane i -> output column sel_ex[i] + shift
        pos = (sel_ex + shift.astype(jnp.float32)).astype(jnp.int32)
        oh = ((pos.reshape(C, 1) == col) & sel.reshape(C, 1)
              ).astype(jnp.float32)                      # (C, SPAN)
        gidx = (g * C + lane + 1).astype(jnp.float32) * sel_f
        comp = jax.lax.dot(gidx, oh,
                           preferred_element_type=jnp.float32)  # (1, SPAN)
        # aligned minor-split to (SPAN/128, 128) rows, then one merged store
        # at a dynamic SUBLANE offset (the Mosaic-friendly form; cf. the
        # roi_align kernel's minor-split shape-casts)
        comp_i = comp.astype(jnp.int32).reshape(SPAN // 128, 128)
        cur = out_ref[0, pl.ds(row0, SPAN // 128), :]
        out_ref[0, pl.ds(row0, SPAN // 128), :] = jnp.where(
            comp_i != 0, comp_i, cur)
        return carry

    jax.lax.fori_loop(0, n_blocks, block, 0)


@partial(jax.jit, static_argnames=("k", "interpret"))
def _topk_threshold_padded(keys, k: int, interpret: bool = False):
    """keys (B, nB, C) int32 (padding = INT_MIN) -> indices (B, k) i32,
    index-ascending, entries = flat position in the padded row."""
    b, nb, c = keys.shape
    assert c == C
    meta, ps, pt = pl.pallas_call(
        partial(_thresh_kernel, k=k, n_blocks=nb),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, nb, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(keys)

    # extract: the out rows hold index+1 packed at slots [0, k); the slack
    # tail (never written or written by trailing-block padding) stays 0
    out_rows = -(-(k + SPAN + 128) // 128)
    lt_c = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
            ).astype(jnp.float32)
    packed = pl.pallas_call(
        partial(_extract_kernel, n_blocks=nb),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nb, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_rows, 128), jnp.int32),
        interpret=interpret,
    )(keys, meta, ps, pt, lt_c)
    return packed.reshape(b, out_rows * 128)[:, :k] - 1


def topk_threshold(scores, k: int, interpret: bool = False):
    """Exact top-k of each row of ``scores`` (B, S) f32 — the ``lax.top_k``
    set (ties at the cut: lowest index wins) in INDEX-ASCENDING order.

    Returns (values (B, k) f32, indices (B, k) int32).  Requires
    1 <= k <= S.  See module docstring for semantics and cost.
    """
    b, s = scores.shape
    if not 1 <= k <= s:
        raise ValueError(f"k={k} out of range for row length {s}")
    keys = _sortable_keys(scores)
    pad = (-s) % C
    if pad:
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=INT_MIN)
    nb = (s + pad) // C
    idx = _topk_threshold_padded(keys.reshape(b, nb, C), k,
                                 interpret=interpret)
    vals = jnp.take_along_axis(scores, idx, axis=1)
    return vals, idx


def topk_threshold_ref(scores, k: int):
    """Pure-jnp oracle: stable argsort on -scores == lax.top_k's set and tie
    rule; re-sorted ascending to match the kernel's output order."""
    order = jnp.argsort(-scores, axis=-1, stable=True)[..., :k]
    idx = jnp.sort(order, axis=-1).astype(jnp.int32)
    return jnp.take_along_axis(scores, idx, axis=-1), idx
