#!/usr/bin/env python
"""Backbone conv-trunk profiling on the real TPU chip.

Breaks the ResNet-50 C4 trunk into stages and slope-times each (in-graph
fori_loop serialized through the activations — same honest methodology as
bench.py; the axon tunnel's block_until_ready is unreliable and dispatches
cost ~25 ms RPC).  Prints per-stage ms + achieved TFLOP/s vs the ~172
TFLOP/s bf16 calibration ceiling, then times stem variants.

Usage: python scripts/profile_backbone.py [--batch 8]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.models.backbones import _ResNetTrunk, Bottleneck, FrozenBatchNorm
from flax import linen as nn


def slope_time(fn, args, n_lo=4, n_hi=12):
    """Per-iteration seconds of fn, in-graph loop slope."""

    @jax.jit
    def loop(n, *args):
        def body(i, carry):
            out = fn(*carry)
            # serialize through the first arg with a zero-valued dependency
            eps = (jnp.asarray(out, jnp.float32).ravel()[0] * 0.0).astype(
                carry[0].dtype)
            return (carry[0] + eps,) + carry[1:]
        final = jax.lax.fori_loop(0, n, body, args)
        return jnp.asarray(final[0], jnp.float32).ravel()[0]

    _ = np.asarray(loop(2, *args))  # compile + warm
    times = {}
    for n in (n_lo, n_hi):
        t0 = time.perf_counter()
        _ = np.asarray(loop(n, *args))
        times[n] = time.perf_counter() - t0
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def conv_flops(h, w, cin, cout, kh, kw, stride):
    oh, ow = h // stride, w // stride
    return 2 * oh * ow * cin * cout * kh * kw


def resnet_c4_flops(h, w, depth=50):
    """Analytic MAC*2 count for conv1..layer3 at input h x w."""
    blocks = {50: (3, 4, 6), 101: (3, 4, 23)}[depth]
    f = conv_flops(h, w, 3, 64, 7, 7, 2)
    h, w = h // 4, w // 4  # after conv1 s2 + maxpool s2
    cin = 64
    for n, ch, stride in zip(blocks, (64, 128, 256), (1, 2, 2)):
        for bi in range(n):
            s = stride if bi == 0 else 1
            f += conv_flops(h, w, cin, ch, 1, 1, 1)
            f += conv_flops(h, w, ch, ch, 3, 3, s)
            f += conv_flops(h // s, w // s, ch, ch * 4, 1, 1, 1)
            if bi == 0:
                f += conv_flops(h, w, cin, ch * 4, 1, 1, s)
            h, w, cin = h // s, w // s, ch * 4
    return f


class Stem(nn.Module):
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class Layer(nn.Module):
    n: int
    ch: int
    stride: int
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for bi in range(self.n):
            x = Bottleneck(self.ch, self.stride if bi == 0 else 1,
                           dtype=self.dtype, name=f"b{bi}")(x)
        return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B, H, W = args.batch, 800, 1216
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))

    total_flops = B * resnet_c4_flops(H, W)
    print(f"C4 trunk FLOPs @ {B}x{H}x{W}: {total_flops/1e9:.1f} GFLOP")

    # ---- whole trunk, as shipped -------------------------------------------
    trunk = _ResNetTrunk(depth=50, dtype=jnp.bfloat16)
    v = trunk.init(jax.random.PRNGKey(0), x[:1])
    dt = slope_time(lambda im: trunk.apply(v, im), (x,))
    print(f"trunk f32-in : {dt*1e3:7.2f} ms  {total_flops/dt/1e12:6.1f} TFLOP/s")

    xb = x.astype(jnp.bfloat16)
    dt = slope_time(lambda im: trunk.apply(v, im), (xb,))
    print(f"trunk bf16-in: {dt*1e3:7.2f} ms  {total_flops/dt/1e12:6.1f} TFLOP/s")

    # ---- stage by stage ----------------------------------------------------
    stages = [("stem 7x7s2+pool", Stem(), x,
               B * conv_flops(H, W, 3, 64, 7, 7, 2))]
    h, w = H // 4, W // 4
    shapes = [(64, 3, 64, 1), (256, 4, 128, 2), (512, 6, 256, 2)]
    flops_per = []
    cin = 64
    hh, ww = h, w
    for i, (n, ch, stride) in enumerate(zip((3, 4, 6), (64, 128, 256), (1, 2, 2))):
        f = 0
        hcur, wcur = hh, ww
        c = cin
        for bi in range(n):
            s = stride if bi == 0 else 1
            f += conv_flops(hcur, wcur, c, ch, 1, 1, 1)
            f += conv_flops(hcur, wcur, ch, ch, 3, 3, s)
            f += conv_flops(hcur // s, wcur // s, ch, ch * 4, 1, 1, 1)
            if bi == 0:
                f += conv_flops(hcur, wcur, c, ch * 4, 1, 1, s)
            hcur, wcur, c = hcur // s, wcur // s, ch * 4
        stages.append((f"layer{i+1} ({n} blocks)",
                       Layer(n=n, ch=ch, stride=stride),
                       jnp.zeros((B, hh, ww, cin), jnp.bfloat16), B * f))
        hh, ww, cin = hcur, wcur, c

    for name, mod, inp, f in stages:
        vv = mod.init(jax.random.PRNGKey(0), inp[:1])
        dt = slope_time(lambda a, m=mod, vv=vv: m.apply(vv, a), (inp,))
        print(f"{name:22s}: {dt*1e3:7.2f} ms  {f/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
