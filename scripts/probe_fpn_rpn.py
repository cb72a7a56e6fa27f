#!/usr/bin/env python
"""Probe the FPN shared-RPN head cost (8.5 ms at 800x1216 B8 vs ~4.4 ms
conv-FLOP floor) and candidate restructures:

  A) shipped: per level relu(conv3x3) -> conv1x1 cls (2A) + conv1x1 box (4A)
  B) merged head: ONE conv1x1 of (6A) channels, split after -- one read of
     the hidden map per level instead of two
  C) rpn_net 3x3 convs alone (the FLOP floor check)

Usage: python scripts/probe_fpn_rpn.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scripts.profile_backbone import slope_time

LEVELS = [(200, 304), (100, 152), (50, 76), (25, 38), (13, 19)]
B, C, A = 8, 256, 3
DT = jnp.bfloat16


class Shipped(nn.Module):
    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        cls = nn.Conv(A * 2, (1, 1), dtype=DT, name="cls")
        box = nn.Conv(A * 4, (1, 1), dtype=DT, name="box")
        probs, boxes = [], []
        for f in pyramid:
            b, h, w, _ = f.shape
            x = nn.relu(rpn(f))
            cm = cls(x).astype(jnp.float32)
            probs.append(jax.nn.sigmoid(
                cm[..., 1::2] - cm[..., 0::2]).reshape(b, h * w * A))
            boxes.append(box(x).reshape(b, h * w * A, 4).astype(jnp.float32))
        return jnp.concatenate(probs, 1), jnp.concatenate(boxes, 1)


class Merged(nn.Module):
    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        head = nn.Conv(A * 6, (1, 1), dtype=DT, name="head")
        probs, boxes = [], []
        for f in pyramid:
            b, h, w, _ = f.shape
            x = nn.relu(rpn(f))
            hm = head(x)
            cm = hm[..., :A * 2].astype(jnp.float32)
            probs.append(jax.nn.sigmoid(
                cm[..., 1::2] - cm[..., 0::2]).reshape(b, h * w * A))
            boxes.append(hm[..., A * 2:].reshape(b, h * w * A, 4)
                         .astype(jnp.float32))
        return jnp.concatenate(probs, 1), jnp.concatenate(boxes, 1)


class ConvOnly(nn.Module):
    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        return [nn.relu(rpn(f)) for f in pyramid]


class NoReshape(nn.Module):
    """A without the (…, 2A)->(K,) reshapes/concat: isolates relayout cost."""

    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        cls = nn.Conv(A * 2, (1, 1), dtype=DT, name="cls")
        box = nn.Conv(A * 4, (1, 1), dtype=DT, name="box")
        outs = []
        for f in pyramid:
            x = nn.relu(rpn(f))
            outs.append(cls(x).astype(jnp.float32))
            outs.append(box(x).astype(jnp.float32))
        return outs


class TokenMatmul(nn.Module):
    """Transposed token-matmul head: one (C, 6A) matmul over concatenated
    level tokens with output lanes = tokens (dense); prob/deltas sliced from
    sublane channels.  Anchor order would become A-major per level."""

    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        w = self.param("head_w", nn.initializers.normal(0.01), (C, A * 6), DT)
        probs, boxes = [], []
        for f in pyramid:
            b, h, w_, _ = f.shape
            x = nn.relu(rpn(f)).reshape(b, h * w_, C)
            hm = jnp.einsum("bkc,cn->bnk", x, w)      # (B, 6A, HW) lanes=K
            cm = hm[:, :2 * A].astype(jnp.float32)
            prob = jax.nn.sigmoid(cm[:, 1::2] - cm[:, 0::2])   # (B, A, HW)
            probs.append(prob.reshape(b, A * h * w_))
            bx = hm[:, 2 * A:].astype(jnp.float32)             # (B, 4A, HW)
            boxes.append(bx.reshape(b, A, 4, h * w_))
        return jnp.concatenate(probs, 1), boxes[0]


class SliceFirst(nn.Module):
    """A with the f32 casts applied AFTER the channel slices (the shipped
    form materializes the full lane-padded (…, 2A)/(…, 4A) maps in f32)."""

    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        cls = nn.Conv(A * 2, (1, 1), dtype=DT, name="cls")
        box = nn.Conv(A * 4, (1, 1), dtype=DT, name="box")
        probs, boxes = [], []
        for f in pyramid:
            b, h, w, _ = f.shape
            x = nn.relu(rpn(f))
            cm = cls(x)
            d = (cm[..., 1::2].astype(jnp.float32)
                 - cm[..., 0::2].astype(jnp.float32))
            probs.append(jax.nn.sigmoid(d).reshape(b, h * w * A))
            boxes.append(box(x).reshape(b, h * w * A, 4).astype(jnp.float32))
        return jnp.concatenate(probs, 1), jnp.concatenate(boxes, 1)


class ProdDetect(nn.Module):
    """EXACTLY the production detect-path head (fpn.py::_rpn_all_levels
    after DCE): conv3x3 -> transposed d-einsum (B, A, HW) prob A-major +
    cells matmul (B, HW, 4A).  (cls matmul is DCE'd on detect; the train
    path adds one more tokens read.)  Round-5 addition for the in-situ
    9.8 ms attribution."""

    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        dw = self.param("dw", nn.initializers.normal(0.01), (C, A), DT)
        db = self.param("db", nn.initializers.zeros, (A,), DT)
        bw = self.param("bw", nn.initializers.normal(0.01), (C, A * 4), DT)
        bb = self.param("bb", nn.initializers.zeros, (A * 4,), DT)
        probs, cells = [], []
        for f in pyramid:
            b, h, w_, _ = f.shape
            x = nn.relu(rpn(f))
            tokens = x.reshape(b, h * w_, C)
            d = jnp.einsum("bkc,ca->bak", tokens, dw,
                           preferred_element_type=jnp.float32)
            d = d + db.astype(jnp.float32)[:, None]
            probs.append(jax.nn.sigmoid(d).reshape(b, A * h * w_))
            cells.append(tokens @ bw + bb)
        return [jnp.concatenate(probs, 1)] + cells


class ConvPlusD(nn.Module):
    """conv + the d-einsum prob only (no cells matmul)."""

    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        dw = self.param("dw", nn.initializers.normal(0.01), (C, A), DT)
        probs = []
        for f in pyramid:
            b, h, w_, _ = f.shape
            x = nn.relu(rpn(f))
            tokens = x.reshape(b, h * w_, C)
            d = jnp.einsum("bkc,ca->bak", tokens, dw,
                           preferred_element_type=jnp.float32)
            probs.append(jax.nn.sigmoid(d).reshape(b, A * h * w_))
        return [jnp.concatenate(probs, 1)]


class ConvPlusCells(nn.Module):
    """conv + the cells matmul only (no prob)."""

    @nn.compact
    def __call__(self, pyramid):
        rpn = nn.Conv(256, (3, 3), padding="SAME", dtype=DT, name="rpn_net")
        bw = self.param("bw", nn.initializers.normal(0.01), (C, A * 4), DT)
        cells = []
        for f in pyramid:
            b, h, w_, _ = f.shape
            x = nn.relu(rpn(f))
            cells.append(x.reshape(b, h * w_, C) @ bw)
        return cells


def main():
    rng = np.random.RandomState(0)
    pyr = [jnp.asarray(rng.randn(B, h, w, C), DT) for h, w in LEVELS]
    flops = sum(2 * B * h * w * 9 * C * C for h, w in LEVELS)
    print(f"backend={jax.default_backend()}  rpn3x3 flops={flops/1e9:.0f} G")

    for name, mod, scalar in (
            ("A shipped   ", Shipped(), False),
            ("B merged 1x1", Merged(), False),
            ("C 3x3 only  ", ConvOnly(), True),
            ("D no-reshape", NoReshape(), True),
            ("E token mm  ", TokenMatmul(), False),
            ("F slice-1st ", SliceFirst(), False),
            ("P prod-det  ", ProdDetect(), True),
            ("Pd conv+d   ", ConvPlusD(), True),
            ("Pc conv+cell", ConvPlusCells(), True)):
        v = mod.init(jax.random.PRNGKey(0), pyr)

        def fn(*ps):
            out = mod.apply(v, list(ps))
            # sum-scalarize: ravel()[0] relayouts every (B,H,W,C) output
            # (the old form made ConvOnly read 15.3 ms vs its true ~4)
            return sum(jnp.sum(jnp.asarray(o, jnp.float32)) for o in out)
        dt = slope_time(fn, tuple(pyr))
        extra = f"  ({flops/dt/1e12:.0f} TF/s)" if scalar else ""
        print(f"{name}: {dt*1e3:7.2f} ms{extra}")


if __name__ == "__main__":
    main()
