"""Feature Pyramid Network Faster R-CNN (BASELINE.json config 3).

The one capability *beyond* the reference (which is single-level C4,
SURVEY.md §7 step 9): ResNet-50/101/152 C2-C5 + a top-down FPN neck (P2-P5,
P6 for RPN), a shared RPN head over all levels with one anchor size per
level (size = FPN.ANCHOR_SCALE * stride), joint cross-level proposal NMS,
RoI level assignment k = floor(k0 + log2(sqrt(wh)/224)) clamped to [P2, P5],
per-level RoIAlign (gather formulation — per-roi cost independent of level
size), and a 2-fc-1024 box head.

Everything stays fixed-shape: per-level anchors concatenate into one anchor
table so the base anchor/proposal target layers apply unchanged; per-level
RoI features are computed for ALL rois on EVERY level and the assigned
level's result selected with a mask (4x RoIAlign work, zero dynamic shapes
— RoIAlign is a tiny fraction of the graph).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from frcnn_tpu.config import Config
from frcnn_tpu.models.backbones import Bottleneck, FrozenBatchNorm, _RESNET_DEPTHS, conv_init
from frcnn_tpu.models.losses import detection_losses_compact
from frcnn_tpu.models.network import (postprocess_detections, decode_boxes,
                                      gather_anchor_rows)
from frcnn_tpu.models.proposals import proposal_layer
from frcnn_tpu.models.targets import anchor_target_compact, proposal_target_layer
from frcnn_tpu.ops.anchors import generate_anchors_pre
from frcnn_tpu.ops.roi_align import (multilevel_pallas_fits,
                                     roi_align_multilevel,
                                     roi_align_multilevel_pallas,
                                     roi_align_multilevel_pallas_sorted)


# single definition in select_kernel.py (kernel wins only at large S/k);
# module bindings kept so tests monkeypatch per site
from frcnn_tpu.ops.pallas.select_kernel import (THRESHOLD_SELECT_MIN_RATIO,
                                               THRESHOLD_SELECT_MIN_S)


def select_pre_nms(fg_prob, box_cells, sizes, per: int, a_n: int,
                   use_threshold: bool = False):
    """Per-level pre-NMS top-k over A-MAJOR fg_prob, with deltas fetched as
    cell rows + an A-way lane select.

    fg_prob (B, K): A-major within each level (idx = a * HW + cell, see
    FasterRCNNFPN._rpn_all_levels); box_cells: per-level (B, H·W, 4A) views
    of the bbox conv output; sizes: per-level K_l; per: top-k per level.

    Returns (sel, sel_scores, sel_deltas): sel (B, pre_n) GLOBAL A-MINOR
    anchor ids (k_local = cell * A + a — the order of the anchor table and
    the per-anchor rows), scores from top_k, deltas (B, pre_n, 4) f32.
    A top-k is order-invariant as a set, so ranking in A-major order selects
    the same anchors.  The point of this formulation: the lane-padded
    (B, K, 4) per-anchor delta rows never materialize on the detect path
    (~2 ms of Mosaic relayout at 800×1216 B8 — scripts/probe_fpn_rpn.py).
    Oracle-tested against take_along_axis-on-rows in tests/test_fpn.py.

    use_threshold (TPU + cfg.TPU.THRESHOLD_SELECT): big levels select via
    the exact threshold Pallas kernel instead of XLA TopK (~full-sort cost
    on this backend), then re-rank the k winners by (-score, index) pairs —
    bit-identical output to lax.top_k including tie order (padding regions
    produce exact score ties, so order parity matters downstream)."""
    sel, sel_cell, sel_a, sel_sc = [], [], [], []
    off = cell_off = 0
    for s in sizes:
        k = min(per, s)
        hw = s // a_n
        lvl = jax.lax.dynamic_slice_in_dim(fg_prob, off, s, axis=1)
        if k >= s:
            # whole level selected — the identity set, no sort needed
            # (downstream re-ranks the cross-level concat anyway)
            sc = lvl
            idx = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32), lvl.shape)
        elif (use_threshold and s >= THRESHOLD_SELECT_MIN_S
              and s >= THRESHOLD_SELECT_MIN_RATIO * k):
            from frcnn_tpu.ops.pallas.select_kernel import topk_threshold

            tv, ti = topk_threshold(lvl, k)        # exact set, index-asc
            # re-rank the k winners with one SMALL top_k: on an index-
            # ascending array its position tie-break IS the original
            # lowest-index rule, so the order is bit-identical to
            # lax.top_k(lvl, k) — and a single-key k-row top_k measured
            # ~3x cheaper than the (-score, index) two-key lax.sort that
            # erased the kernel's win (PROFILE_r04 §6 first attempt)
            sc, pos = jax.lax.top_k(tv, k)
            idx = jnp.take_along_axis(ti, pos, axis=1)
        else:
            # plain XLA TopK (ops/select.topk_strided measured faster still
            # but the axon backend mis-executes its strided graphs —
            # PROFILE_r04 §2; the threshold kernel above is the fix)
            sc, idx = jax.lax.top_k(lvl, k)
        a = idx // hw
        cell = idx % hw
        sel.append(cell * a_n + a + off)
        sel_cell.append(cell + cell_off)
        sel_a.append(a)
        sel_sc.append(sc)
        off += s
        cell_off += hw
    sel = jnp.concatenate(sel, axis=1)                      # (B, pre_n)
    sel_cell = jnp.concatenate(sel_cell, axis=1)
    sel_a = jnp.concatenate(sel_a, axis=1)
    sel_scores = jnp.concatenate(sel_sc, axis=1)
    cells = jnp.concatenate(box_cells, axis=1)              # (B, ΣHW, 4A)
    rows = jnp.take_along_axis(cells, sel_cell[..., None], axis=1)
    rows = rows.reshape(rows.shape[0], rows.shape[1], a_n, 4)
    pick = (sel_a[..., None] == jnp.arange(a_n))[..., None]
    sel_deltas = jnp.sum(
        jnp.where(pick, rows, 0.0), axis=2).astype(jnp.float32)
    return sel, sel_scores, sel_deltas


class _ResNetStages(nn.Module):
    """ResNet trunk returning C2..C5 (strides 4, 8, 16, 32)."""

    depth: int = 101
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"
    fused: bool = False  # fused Pallas bottlenecks (auto-gated; see Bottleneck)

    @nn.compact
    def __call__(self, x):
        from frcnn_tpu.models.backbones import (FrozenBatchNorm, _StemConv,
                                                make_norm)

        blocks = _RESNET_DEPTHS[self.depth]
        if self.norm == "frozen_bn":
            # fully fused space-to-depth stem (conv+bn+relu+pool, see
            # backbones._StemConv) — the BN affine pre-folds into the conv
            mul, add = FrozenBatchNorm(dtype=self.dtype, name="bn1")(channels=64)
            x = _StemConv(features=64, dtype=self.dtype, name="conv1")(x, mul, add)
        else:
            # GroupNorm is data-dependent → s2d conv only, then norm+relu+pool
            x = _StemConv(features=64, dtype=self.dtype, name="conv1")(x)
            x = make_norm(self.norm, self.dtype)(name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        for li, (n, ch, stride) in enumerate(
                zip(blocks, (64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            for bi in range(n):
                # narrow stages only — see backbones.FUSED_MAX_CH
                from frcnn_tpu.models import backbones as _bb

                x = Bottleneck(ch, stride if bi == 0 else 1, dtype=self.dtype,
                               norm=self.norm,
                               fused=self.fused and ch <= _bb.FUSED_MAX_CH,
                               name=f"layer{li}_block{bi}")(x)
            outs.append(x)
        return outs  # [C2, C3, C4, C5]


class FPNNeck(nn.Module):
    """Top-down pathway + lateral connections (Lin et al. FPN)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        # feats: [C2, C3, C4, C5] low→high stride
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name=f"lateral{i + 2}")(f)
            for i, f in enumerate(feats)
        ]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            top = outs[0]
            # Nearest 2x upsample as broadcast+reshape (+crop for odd lat
            # dims) instead of jax.image.resize: resize's gather lowering
            # materialized gather+transpose pairs costing ~0.7 ms at
            # 800x1216 B8 (124.5 MB x2 at P2 alone — HLO scan,
            # PROFILE_r05 §5).  For the even-dim bucket chains every
            # production config uses, the two are element-identical
            # (nearest with scale exactly 2 == repeat); odd tails crop the
            # last row/col, the Detectron scale_factor=2 semantics.
            b, th, tw, c = lat.shape
            sh, sw = top.shape[1], top.shape[2]
            up = jnp.broadcast_to(
                top[:, :, None, :, None, :], (b, sh, 2, sw, 2, c)
            ).reshape(b, 2 * sh, 2 * sw, c)[:, :th, :tw]
            outs.insert(0, lat + up)
        ps = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=conv_init, name=f"output{i + 2}")(o)
            for i, o in enumerate(outs)
        ]
        # P6 for RPN only: stride-2 subsample of P5 (Detectron maxpool-1)
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return ps + [p6]  # [P2, P3, P4, P5, P6]


class _FPNBoxHead(nn.Module):
    """2-fc-1024 box head (standard FPN head; replaces the C4 layer4 tail)."""

    dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled, train: bool = False):
        # DenseGeneral contracts (p, p, C) directly (kernel (p, p, C, dim)):
        # the explicit reshape-to-12544 form forced a 60 MB lane-merge
        # relayout of the pooled features per detect batch at 800×1216 B8
        # (HLO copy scan, PROFILE_r05 §5).  Same math and init as the
        # flattened Dense (kernel is the reshape of the old one).
        x = pooled.astype(self.dtype)
        x = nn.relu(nn.DenseGeneral(self.dim, axis=(-3, -2, -1),
                                    dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x))
        return x


class FasterRCNNFPN(nn.Module):
    """FPN detector with the same predict/detect/train_forward API as
    FasterRCNN (models/network.py)."""

    num_classes: int
    config: Config
    depth: int = 101
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"   # 'group' enables from-scratch training

    @property
    def _A(self) -> int:
        return len(self.config.ANCHOR_RATIOS)  # one scale per level

    @property
    def _levels(self):
        f = self.config.FPN
        return tuple(range(f.MIN_LEVEL, f.MAX_LEVEL + 2))  # P2..P6 (RPN)

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal
        self.stages = _ResNetStages(depth=self.depth, dtype=self.dtype,
                                    norm=self.norm,
                                    fused=cfg.TPU.FUSED_RESNET_BLOCKS,
                                    name="stages")
        self.neck = FPNNeck(out_channels=cfg.FPN.OUT_CHANNELS, dtype=self.dtype,
                            name="neck")
        self.box_head = _FPNBoxHead(dtype=self.dtype, name="box_head")
        # shared RPN head across levels.  The 1x1 cls/box heads are explicit
        # (C, n) matmul params rather than nn.Conv: the fg probability is
        # computed as a TRANSPOSED weight-difference matmul (lanes = tokens)
        # so its (…, 2A)->(K,) lane-padded relayout never exists — see
        # _rpn_all_levels.
        self.rpn_net = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                               kernel_init=init(0.01), name="rpn_net")
        rpn_ch = 256
        self.rpn_cls_w = self.param("rpn_cls_w", init(0.01),
                                    (rpn_ch, self._A * 2), self.dtype)
        self.rpn_cls_b = self.param("rpn_cls_b", nn.initializers.zeros,
                                    (self._A * 2,), self.dtype)
        self.rpn_box_w = self.param("rpn_box_w", init(0.01),
                                    (rpn_ch, self._A * 4), self.dtype)
        self.rpn_box_b = self.param("rpn_box_b", nn.initializers.zeros,
                                    (self._A * 4,), self.dtype)
        self.cls_score = nn.Dense(self.num_classes, kernel_init=init(0.01),
                                  name="cls_score")
        self.bbox_pred = nn.Dense(self.num_classes * 4, kernel_init=init(0.001),
                                  name="bbox_pred")

    # -- stages ---------------------------------------------------------------
    @property
    def input_block(self) -> int:
        """Host-packing factor (see backbones.pack_images); the GroupNorm
        variant keeps the plain layout (its stem norm is data-dependent)."""
        return 4 if self.norm == "frozen_bn" else 1

    def _preprocess(self, images):
        from frcnn_tpu.models.backbones import preprocess_images

        return preprocess_images(images, self.config, self.dtype)

    def _pyramid(self, images):
        return self.neck(self.stages(self._preprocess(images)))  # P2..P6

    def _rpn_all_levels(self, pyramid):
        """Shared RPN over P2..P6 → concatenated (B, K, ...) in level order.

        Returns (cls, prob, box_rows, box_cells, cls_cells):
          cls (B, K, 2) / box_rows (B, K, 4) — dense per-anchor rows, kept
          for oracle tests/probes only.  Their (…, 2A/4A) → (K, ·)
          conversions are lane-padded Mosaic relayouts costing ~3.7 ms at
          800×1216 B8 (probe: scripts/probe_fpn_rpn.py — heads and casts
          fuse to ~0, reshapes don't), so NEITHER production path consumes
          them (XLA then DCEs both): `_propose` reads box_cells and the
          train loss gathers sampled rows from the cell views
          (network.gather_anchor_rows).
          prob (B, K) — fg probability, sigmoid(fg−bg), A-MAJOR within each
          level (cls/box rows and the anchor table stay A-minor; _propose
          remaps its top-k indices).
          box_cells / cls_cells — per-level (B, H·W, 4A/2A) bf16 views of
          the conv outputs (lane-preserving reshapes, free) for cell-row
          gathering.
        """
        a_n = self._A
        # fg-probability head: sigmoid(fg − bg) depends only on the WEIGHT
        # DIFFERENCE, so compute it as one transposed matmul whose output
        # lanes are the (dense) tokens — (B, A, HW) — and whose (B, A·HW)
        # flatten is an aligned row merge.  The resulting prob ordering is
        # A-MAJOR within each level; `_propose` remaps its top-k indices back
        # to the A-minor anchor ids.  (The straight conv form pays a
        # lane-padded (…, 2A) → (K,) Mosaic relayout per level: ~4 ms at
        # 800×1216 B8 in situ — scripts/probe_fpn_rpn.py.)
        dw = (self.rpn_cls_w[:, 1::2] - self.rpn_cls_w[:, 0::2])   # (C, A)
        db = (self.rpn_cls_b[1::2] - self.rpn_cls_b[0::2])         # (A,)
        cls_list, prob_list, box_list = [], [], []
        cell_list, cls_cell_list = [], []
        for feat in pyramid:
            b, h, w, _ = feat.shape
            x = nn.relu(self.rpn_net(feat))
            tokens = x.reshape(b, h * w, x.shape[-1])
            d = jnp.einsum("bkc,ca->bak", tokens, dw,
                           preferred_element_type=jnp.float32)
            d = d + db.astype(jnp.float32)[:, None]
            prob_list.append(jax.nn.sigmoid(d).reshape(b, a_n * h * w))
            cells = tokens @ self.rpn_box_w + self.rpn_box_b      # (B,HW,4A)
            cell_list.append(cells)
            cls_map = tokens @ self.rpn_cls_w + self.rpn_cls_b    # (B,HW,2A)
            cls_cell_list.append(cls_map)
            # dense per-anchor rows (A-minor, aligned with the anchor table)
            # for oracle tests; DCE'd on both production paths
            cls_list.append(
                cls_map.reshape(b, h * w * a_n, 2).astype(jnp.float32))
            box_list.append(
                cells.reshape(b, h * w * a_n, 4).astype(jnp.float32))
        cls = jnp.concatenate(cls_list, axis=1)
        box = jnp.concatenate(box_list, axis=1)
        prob = jnp.concatenate(prob_list, axis=1)   # A-major per level!
        return cls, prob, box, cell_list, cls_cell_list

    def _anchors(self, pyramid):
        """Per-level anchors concatenated in the same order as the RPN
        outputs: one size per level (ANCHOR_SCALE * stride), cfg ratios."""
        cfg = self.config
        all_anchors = []
        for level, feat in zip(self._levels, pyramid):
            stride = 2 ** level
            a, _ = generate_anchors_pre(
                feat.shape[1], feat.shape[2], stride,
                ratios=cfg.ANCHOR_RATIOS, scales=(cfg.FPN.ANCHOR_SCALE,))
            all_anchors.append(a)
        return jnp.concatenate(all_anchors, axis=0)

    def _level_split_pre_nms(self, pyramid, train: bool):
        """Per-level pre-NMS top-k sizes (level boundaries in the concat)."""
        cfg = self.config
        per = (cfg.FPN.PRE_NMS_PER_LEVEL_TRAIN if train
               else cfg.FPN.PRE_NMS_PER_LEVEL_TEST)
        sizes = [f.shape[1] * f.shape[2] * self._A for f in pyramid]
        return sizes, per

    def _propose(self, pyramid, fg_prob, box_cells, anchors, im_info,
                 train: bool):
        """Per-level top-k then joint cross-level NMS (Detectron FPN style).

        box_cells: per-level (B, H·W, 4A) bbox-conv views — the selected
        anchors' deltas are fetched as CELL rows + an A-way lane select,
        so the lane-padded (B, K, 4) relayout of all ~243k anchors never
        materializes (detect-path cost: ~2.5 ms at 800×1216 B8)."""
        cfg = self.config
        a_n = self._A
        sizes, per = self._level_split_pre_nms(pyramid, train)
        post = (cfg.TRAIN.RPN_POST_NMS_TOP_N if train
                else cfg.TEST.RPN_POST_NMS_TOP_N)
        thresh = cfg.TRAIN.RPN_NMS_THRESH if train else cfg.TEST.RPN_NMS_THRESH

        use_threshold = (cfg.TPU.USE_PALLAS and cfg.TPU.THRESHOLD_SELECT
                         and jax.default_backend() == "tpu")
        sel, sel_scores, sel_deltas = select_pre_nms(
            fg_prob, box_cells, sizes, per, a_n, use_threshold=use_threshold)
        sel_anchors = anchors[sel]                              # (B, pre_n, 4)

        # joint cross-level NMS, one batched launch; per-image anchors differ
        # so decode/validity run on gathered arrays directly
        from frcnn_tpu.models.proposals import _anchor_validity
        from frcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
        from frcnn_tpu.ops.nms import nms_fixed_batched, NEG_INF

        proposals = bbox_transform_inv(sel_anchors, sel_deltas)
        proposals = clip_boxes(proposals, im_info[:, :2])
        av = jax.vmap(_anchor_validity)(sel_anchors, im_info)
        scores = jnp.where(av, sel_scores, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(scores, scores.shape[1])
        top_boxes = jnp.take_along_axis(proposals, top_idx[..., None], axis=1)
        top_valid = top_scores > NEG_INF / 2
        # cross-level top_k output is already descending → skip the re-sort
        keep_idx, keep_valid = nms_fixed_batched(
            top_boxes, top_scores, thresh, post, valid=top_valid,
            use_pallas=cfg.TPU.USE_PALLAS, presorted=True)
        rois = jnp.take_along_axis(top_boxes, keep_idx[..., None], axis=1)
        roi_scores = jnp.where(
            keep_valid, jnp.take_along_axis(top_scores, keep_idx, axis=1), 0.0)
        rois = jnp.where(keep_valid[..., None], rois, 0.0)
        return rois, roi_scores, keep_valid

    def _assign_levels(self, rois):
        """k = floor(k0 + log2(sqrt(wh)/canonical)), clamped to [MIN, MAX]."""
        f = self.config.FPN
        w = jnp.maximum(rois[..., 2] - rois[..., 0] + 1.0, 1.0)
        h = jnp.maximum(rois[..., 3] - rois[..., 1] + 1.0, 1.0)
        k = jnp.floor(f.ROI_CANONICAL_LEVEL
                      + jnp.log2(jnp.sqrt(w * h) / f.ROI_CANONICAL_SCALE + 1e-8))
        return jnp.clip(k, f.MIN_LEVEL, f.MAX_LEVEL).astype(jnp.int32)

    def _pool(self, pyramid, rois, defer_unsort: bool = False):
        """Level-assigned RoIAlign.  On TPU (when the level shapes fit the
        kernel's VMEM gate) this runs the matmul-form Pallas kernel per
        level with roi-tile skipping (ops.roi_align.
        roi_align_multilevel_pallas — MXU matmuls instead of a 1 KB-run HBM
        gather; fwd+bwd 18.8 → 8.3 ms at the 608×1024 B8 train shape).
        Everywhere else: ONE gather pass over a flattened per-image level
        table (roi_align_multilevel) — 1/4 the gather traffic of the
        compute-every-level-and-mask formulation both replace.  pyramid:
        P2..P6 (P6 unused for RoIs)."""
        cfg = self.config
        f = cfg.FPN
        levels = self._assign_levels(rois) - f.MIN_LEVEL  # (B, N) in [0, L)
        roi_levels = list(range(f.MIN_LEVEL, f.MAX_LEVEL + 1))
        maps = pyramid[:len(roi_levels)]
        strides = [2 ** l for l in roi_levels]
        use_pallas = (cfg.TPU.USE_PALLAS and jax.default_backend() == "tpu"
                      and multilevel_pallas_fits(
                          [m.shape[1:3] for m in maps], maps[0].shape[-1]))
        if use_pallas and defer_unsort:
            # sorted-rows PADDED output + per-image inverse permutation:
            # the caller runs the row-equivariant head on the padded
            # sorted rows and permutes the HEAD's small per-roi outputs
            # instead of this 60 MB feature tensor — the take(…, inv)
            # both un-sorts and drops the pad rows
            # (roi_align_multilevel_pallas_sorted docstring; PROFILE_r05 §5)
            return jax.vmap(
                lambda fs, r, lv: roi_align_multilevel_pallas_sorted(
                    fs, r, lv, strides=strides,
                    output_size=cfg.POOLING_SIZE,
                    sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO)
            )(maps, rois, levels)  # ((B, N_pad, p, p, C) sorted, (B, N) inv)
        pool_fn = (roi_align_multilevel_pallas if use_pallas
                   else roi_align_multilevel)
        pooled = jax.vmap(
            lambda fs, r, lv: pool_fn(
                fs, r, lv, strides=strides,
                output_size=cfg.POOLING_SIZE,
                sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO)
        )(maps, rois, levels)  # (B, N, p, p, C)
        return (pooled, None) if defer_unsort else pooled

    def _classify(self, pooled, train: bool):
        b, n = pooled.shape[:2]
        flat = pooled.reshape((b * n,) + pooled.shape[2:])
        fc = self.box_head(flat, train=train)
        cls_logits = self.cls_score(fc).astype(jnp.float32)
        bbox = self.bbox_pred(fc).astype(jnp.float32)
        return (cls_logits.reshape(b, n, -1),
                jax.nn.softmax(cls_logits, axis=-1).reshape(b, n, -1),
                bbox.reshape(b, n, -1))

    # -- modes ------------------------------------------------------------------
    def predict(self, images, im_info):
        pyramid = self._pyramid(images)
        _, fg_prob, _, box_cells, _ = self._rpn_all_levels(pyramid)
        anchors = self._anchors(pyramid)
        rois, roi_scores, roi_valid = self._propose(
            pyramid, fg_prob, box_cells, anchors, im_info, train=False)
        pooled, inv = self._pool(pyramid, rois, defer_unsort=True)
        _, cls_prob, bbox_pred = self._classify(pooled, train=False)
        if inv is not None:
            # restore roi row order on the small head outputs (exact: the
            # box head is row-equivariant) instead of the pooled features
            cls_prob = jnp.take_along_axis(cls_prob, inv[..., None], axis=1)
            bbox_pred = jnp.take_along_axis(bbox_pred, inv[..., None], axis=1)
        return {"rois": rois, "roi_scores": roi_scores, "roi_valid": roi_valid,
                "cls_prob": cls_prob, "bbox_pred": bbox_pred}

    def decode_detections(self, out, im_info):
        return decode_boxes(out, im_info, self.config, self.num_classes)

    def detect(self, images, im_info, max_per_image: int | None = None):
        out = self.predict(images, im_info)
        return postprocess_detections(out, im_info, self.config,
                                      self.num_classes,
                                      max_per_image or self.config.TEST.MAX_PER_IMAGE)

    def train_forward(self, images, im_info, gt_boxes, gt_labels, gt_valid, key):
        cfg = self.config
        b = images.shape[0]
        pyramid = self._pyramid(images)
        _, fg_prob, _, box_cells, cls_cells = self._rpn_all_levels(pyramid)
        anchors = self._anchors(pyramid)

        rois, _, roi_valid = self._propose(
            pyramid, jax.lax.stop_gradient(fg_prob),
            jax.tree.map(jax.lax.stop_gradient, box_cells), anchors,
            im_info, train=True)

        keys = jax.random.split(key, 2 * b)
        at = jax.vmap(
            lambda g, gv, i, k: anchor_target_compact(anchors, g, gv, i, k, cfg)
        )(gt_boxes, gt_valid, im_info, keys[:b])
        pt = jax.vmap(
            lambda r, rv, g, gl, gv, k: proposal_target_layer(
                r, rv, g, gl, gv, k, cfg, self.num_classes)
        )(rois, roi_valid, gt_boxes, gt_labels, gt_valid, keys[b:])

        pooled, pool_inv = self._pool(pyramid, pt.rois, defer_unsort=True)
        cls_logits, cls_prob, bbox_pred = self._classify(pooled, train=True)
        if pool_inv is not None:
            # re-align head rows with pt's roi order (see predict)
            cls_logits = jnp.take_along_axis(cls_logits,
                                             pool_inv[..., None], axis=1)
            bbox_pred = jnp.take_along_axis(bbox_pred,
                                            pool_inv[..., None], axis=1)
        # RPN loss rows gathered at the sampled anchors only — the dense
        # (B, K, 2)/(B, K, 4) per-anchor rows (and their lane-padded Mosaic
        # relayouts + O(K) loss backward) never enter the train graph.
        cls_rows = gather_anchor_rows(
            jnp.concatenate(cls_cells, axis=1), at.sel, self._A, 2)
        box_rows = gather_anchor_rows(
            jnp.concatenate(box_cells, axis=1), at.sel, self._A, 4)
        losses = jax.vmap(detection_losses_compact)(cls_rows, box_rows, at,
                                                    cls_logits, bbox_pred, pt)
        losses = jax.tree.map(jnp.mean, losses)
        aux = {"rois": pt.rois, "roi_labels": pt.labels,
               "n_fg": jnp.sum(pt.labels > 0)}
        return losses, aux

    def __call__(self, images, im_info):
        return self.predict(images, im_info)

    def frozen_param(self, path: tuple, cfg=None) -> bool:
        """Freezing for the optimizer mask: frozen-BN params always (not
        GroupNorm); conv1 + fixed blocks inside 'stages' (same policy as the
        C4 resnet).  GroupNorm variants honor RESNET.FIXED_BLOCKS too, with
        one difference: conv1 is frozen only when FIXED_BLOCKS >= 1 (the
        frozen-BN path pins conv1 unconditionally because it assumes
        pretrained weights; a from-scratch GN run sets FIXED_BLOCKS=0 and
        must freeze NOTHING — build_fpn_model warns otherwise)."""
        s = [str(p) for p in path]
        if self.norm == "frozen_bn" and any(
                p.startswith(("bn", "downsample_bn")) for p in s):
            return True
        if s and s[0] == "stages":
            fixed = cfg.RESNET.FIXED_BLOCKS if cfg is not None else 1
            if any(p in ("conv1", "bn1") for p in s[1:2]):
                return self.norm == "frozen_bn" or fixed >= 1
            for k in range(1, fixed + 1):
                if len(s) > 1 and s[1].startswith(f"layer{k}_"):
                    return True
        return False


def build_fpn_model(net: str, num_classes: int, cfg: Config, dtype=jnp.float32):
    """net: 'res{50,101,152}_fpn' (frozen-BN, reference-parity pretrained
    path) or 'res{...}_fpn_gn' (GroupNorm — trainable from scratch)."""
    norm = "group" if net.endswith("_gn") else "frozen_bn"
    if norm == "group" and cfg.RESNET.FIXED_BLOCKS > 0:
        print(f"WARNING: {net} is the from-scratch GroupNorm variant but "
              f"RESNET.FIXED_BLOCKS={cfg.RESNET.FIXED_BLOCKS} will freeze "
              "randomly initialized early stages (conv1..layer"
              f"{cfg.RESNET.FIXED_BLOCKS}) — set RESNET.FIXED_BLOCKS 0 "
              "unless you are loading pretrained weights")
    depth = int(net.replace("res", "").replace("_fpn", "").replace("_gn", ""))
    return FasterRCNNFPN(num_classes=num_classes, config=cfg, depth=depth,
                         dtype=dtype, norm=norm)
