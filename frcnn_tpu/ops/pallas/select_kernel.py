"""Pallas-assisted exact top-k by threshold (radix-select) for the
proposal layers.

TPU-native replacement for the proposal layer's pre-NMS score selection
(``lib/layer_utils/proposal_layer.py:~L20-L80`` sorts all anchor scores and
keeps RPN_PRE_NMS_TOP_N; SURVEY.md #13).  ``jax.lax.top_k`` on this backend
costs ~a full sort of the row regardless of k (measured: k=48 is *slower*
than k=2000 on a 116k row — PROFILE_r04 §2), so selecting 1-2k of ~117-182k
FPN anchor scores burns ~1.3-1.5 ms/level at production shapes.  The
XLA-level two-stage decomposition (``ops/select.topk_strided``) measured
1.8x faster but the axon backend mis-executes its strided multi-TopK
graphs (PROFILE_r04 §2) — this module avoids XLA TopK entirely.

Contract: ``topk_threshold(scores (B, S) f32, k)`` returns
``(values (B, k) f32, indices (B, k) int32)`` — the EXACT top-k *set* of
``lax.top_k`` including its tie rule (for equal values at the cut, lower
index wins), but in **index-ascending order**, not score-descending.
Callers that need score-descending order re-rank the k winners with one
small single-key ``lax.top_k`` (position tie-break on the index-ascending
row = the lowest-index rule; see models/fpn.py::select_pre_nms) — still
far cheaper than sorting the full row.  NaN scores sort as LARGEST (the
lax.top_k total order), so a diverged run surfaces as visible NaNs in the
selected values rather than a silently different selection; ±inf and
every finite float are fine.

Two stages, both O(S) work, no sort and no sequential per-block walk
(a first design walked blocks with a fori of small matmuls — measured
LATENCY-bound at ~8 µs/block, slower than the top_k it replaced; the
extraction below is all wide vector ops):

  Stage 1 (``_thresh_kernel``, Pallas): map scores to order-preserving
  int32 keys (host-side elementwise sign-fixup of the float bits), then
  binary-search the 31 value bits for the k-th largest key T with 31
  masked-count reductions over the VMEM-resident row — one HBM read
  total.  Then count per C-lane block the strict survivors (key > T) and
  threshold ties (key == T), and emit both as exclusive running prefixes
  (one triangular matmul): ``ps``/``pt`` (B, nB, 1), plus T and
  r = k - count(key > T) (how many ties to keep, lowest-index-first).

  Stage 2 (pure XLA): the selected set is
  ``strict | (tie & global_tie_rank < r)`` — exactly k elements.  For
  each output slot j in [0, k): its block is the last g with
  ``base[g] <= j`` (base = ps + min(pt, r), non-decreasing — a dense
  compare-count, no searchsorted loop), its in-block rank is
  ``j - base[g]``, and its lane is the one whose in-block exclusive
  selected-cumsum equals that rank — a row gather of the block's cumsum
  plus a C-wide match reduction, vectorized over all (B, k) slots.

Exactness is structural (integer compares on keys computed once), not
probabilistic: no saturation case, no fallback branch — the two
properties the strided XLA decomposition could not give us.
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

C = 512          # lanes per block (prefix-table granularity)
INT_MIN = -2147483648  # python int: jnp scalars would be captured consts

# Profitability gate, single source of truth — models/{fpn,proposals,
# targets}.py import these; tests monkeypatch their per-module bindings to
# exercise the kernel at small shapes.  Enable the kernel only when
#   S >= MIN_S  AND  S >= MIN_RATIO * k:
# the kernel's cost scales with k (the O(B*k*C) extraction + the k-wide
# re-rank) while XLA TopK's scales with S, so the win regime is large S/k.
# Measured crossover (PROFILE_r05 §3, 2026-08-21): S/k = 5.7 (C4 detect,
# 34200/6000) loses ~1.7 ms; S/k ~ 15 is inside timing noise; S/k >= 46
# wins clearly (+0.09 .. +1.7 ms).  MIN_RATIO = 24 splits the neutral
# band.  NOTE the backend moved under us here: round 4 measured XLA TopK
# ~full-sort cost at 34k rows, round 5 measures it ~0.36 ms at the same
# shape — this gate encodes round-5 reality; re-measure on backend
# updates (`python scripts/probe_topk_threshold.py --sweep`).
THRESHOLD_SELECT_MIN_S = 16384
THRESHOLD_SELECT_MIN_RATIO = 24


def _sortable_keys(scores):
    """Order-preserving f32 -> int32 map: for non-negative floats the raw
    bits already sort; negative floats sort reversed, fixed by XOR with
    0x7fffffff.  (-0.0 maps below +0.0 — consistent, since -0.0 == 0.0
    score ties cannot arise from distinct detector scores.)  NaN maps to a
    single key ABOVE +inf's, the lax.top_k total order: a NaN from a
    diverged run is selected first and shows up as visible NaN values,
    instead of a negative-NaN bit pattern landing at/near the INT_MIN
    padding key and being silently dropped (round-4 ADVICE).  Padding uses
    INT_MIN, which no float (NaN included, after the remap) maps to, so
    pads never tie with real entries."""
    s = scores.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(s, jnp.int32)
    keys = jnp.where(u < 0, u ^ jnp.int32(0x7FFFFFFF), u)
    return jnp.where(jnp.isnan(s), jnp.int32(0x7FC00000), keys)


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
    # one matmul with the transposed-triangular constant (GT[i,j] = j < i).
    # Precision.HIGHEST is MANDATORY: this is integer data-movement math
    # (counts up to C=512 per lane block), and the MXU's default precision
    # truncates f32 operands to bf16, which is exact only for integers
    # <= 256.  At default precision any 512-lane block holding > 256
    # selected elements produced a wrong prefix -> wrong top-k SET on
    # hardware (round-4 judge repro: (8, 116736) k=2000 with a clustered
    # high-score run -> 772/16000 wrong indices; exact in CPU interpret
    # mode, which is why CI missed it).  See docs/ARCHITECTURE.md
    # "Matmul precision policy".
    cs = jnp.sum(strict, axis=1, keepdims=True)  # (nB, 1) f32, counts <= C
    ct = jnp.sum(tie, axis=1, keepdims=True)
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    gt_mat = (bj < bi).astype(jnp.float32)
    ps = jax.lax.dot(gt_mat, cs, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    pt = jax.lax.dot(gt_mat, ct, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    mi = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    meta_ref[0] = jnp.where(mi == 0, t, jnp.where(mi == 1, r, 0))
    ps_ref[0] = ps.astype(jnp.int32)
    pt_ref[0] = pt.astype(jnp.int32)


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
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(keys)

    # ---- stage 2: wide-vector extraction (pure XLA) ----
    t = meta[:, 0, 0][:, None, None]                       # (B, 1, 1)
    r = meta[:, 0, 1][:, None]                             # (B, 1)
    ps = ps[:, :, 0]                                       # (B, nB)
    pt = pt[:, :, 0]
    strict = keys > t                                      # (B, nB, C)
    tie = keys == t
    tie_i = tie.astype(jnp.int32)
    tie_ex = jnp.cumsum(tie_i, axis=-1) - tie_i            # exclusive
    sel = strict | (tie & (pt[:, :, None] + tie_ex < r[:, :, None]))
    sel_i = sel.astype(jnp.int32)
    sel_ex = jnp.cumsum(sel_i, axis=-1) - sel_i            # (B, nB, C)

    base = ps + jnp.minimum(pt, r)                         # (B, nB) nondecr.
    j = jnp.arange(k, dtype=jnp.int32)[None, :]            # (1, k)
    # owner block: last g with base[g] <= j (dense compare-count)
    g = jnp.sum((base[:, None, :] <= j[:, :, None]).astype(jnp.int32),
                axis=-1) - 1                               # (B, k)
    rank = j - jnp.take_along_axis(base, g, axis=1)        # (B, k)
    # one packed (B, k, C) row gather instead of two: lane L is slot j's
    # winner iff sel[L] and excl-cumsum[L] == rank[j], i.e. iff
    # 2*sel_ex[L] + sel[L] == 2*rank + 1 (sel_ex < S << 2^30, no overflow).
    # Halves the gather+relayout traffic of this stage — the two s32
    # (8,1000,512) gather+transpose pairs per select were 33 MB each in
    # the detect HLO (PROFILE_r05 §5).
    packed = sel_ex * 2 + sel_i                            # (B, nB, C)
    rows = jnp.take_along_axis(packed, g[:, :, None], axis=1)  # (B, k, C)
    hit = rows == (2 * rank[:, :, None] + 1)               # one lane per slot
    lane = jnp.sum(jnp.where(
        hit, jax.lax.broadcasted_iota(jnp.int32, hit.shape, 2), 0), axis=-1)
    return g * C + lane


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
