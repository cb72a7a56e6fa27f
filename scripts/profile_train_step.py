#!/usr/bin/env python
"""On-chip training-step throughput: slope-timed fused fwd+bwd+SGD step.

The reference publishes no train speed (SURVEY.md §6); its loop runs 1
image/step with ≥4 host↔device round-trips per step (SURVEY.md §3.1).  Ours
is one jitted step at any IMS_PER_BATCH.  This probe measures pure device
step time (same in-graph fori_loop slope methodology as bench.py — the
axon tunnel's block_until_ready is unreliable and each dispatch pays
~25 ms RPC) at the reference config (batch 1) and the throughput config
(batch 8), 600×1000-class shapes on the default landscape bucket.
"""

import dataclasses
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frcnn_tpu.config import default_config
from frcnn_tpu.engine.train import make_optimizer
from frcnn_tpu.models import build_model
from frcnn_tpu.models.backbones import pack_images


def step_time(model, tx, state, feed, n_lo=3, n_hi=9):
    """Slope-timed seconds per train step (mirrors SolverWrapper's step,
    including stop_frozen_gradients unless --nofreeze)."""
    from frcnn_tpu.engine.train import _param_labels, stop_frozen_gradients

    labels = _param_labels(model, state["params"])
    freeze = "--nofreeze" not in sys.argv

    def one_step(state, key):
        def loss_fn(params):
            p = stop_frozen_gradients(labels, params) if freeze else params
            losses, _ = model.apply(
                {"params": p}, feed["data"], feed["im_info"],
                feed["gt_boxes"], feed["gt_labels"], feed["gt_valid"], key,
                method="train_forward", rngs={"dropout": key})
            return losses["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, loss

    @jax.jit
    def loop(state, n):
        def body(i, carry):
            st, acc = carry
            st, loss = one_step(st, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return st, acc + loss
        return jax.lax.fori_loop(0, n, body, (state, 0.0))

    st, acc = loop(state, 2)  # compile + warmup
    _ = np.asarray(acc)
    times = {}
    for n in (n_lo, n_hi):
        t0 = time.perf_counter()
        _, acc = loop(state, n)
        _ = np.asarray(acc)
        times[n] = time.perf_counter() - t0
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def stage_times(model, state, feed):
    """Slope-time pieces of the train step: forward-only, value_and_grad,
    and the full step (grad + optimizer update) measured by step_time."""

    def fwd(params, key):
        losses, _ = model.apply(
            {"params": params}, feed["data"], feed["im_info"],
            feed["gt_boxes"], feed["gt_labels"], feed["gt_valid"], key,
            method="train_forward", rngs={"dropout": key})
        return losses["total_loss"]

    def loop(params, n, with_grad):
        def body(i, carry):
            p, acc = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            if with_grad:
                loss, grads = jax.value_and_grad(fwd)(p, key)
                # consume grads so XLA cannot drop the backward
                acc = acc + loss + sum(
                    jnp.sum(g.astype(jnp.float32) * 0.0)
                    for g in jax.tree.leaves(grads))
            else:
                acc = acc + fwd(p, key)
            return p, acc
        return jax.lax.fori_loop(0, n, body, (params, 0.0))[1]

    out = {}
    for tag, wg in (("forward", False), ("fwd+bwd", True)):
        f = jax.jit(loop, static_argnums=(2,))
        _ = np.asarray(f(state["params"], 2, wg))
        times = {}
        for n in (3, 9):
            t0 = time.perf_counter()
            _ = np.asarray(f(state["params"], n, wg))
            times[n] = time.perf_counter() - t0
        out[tag] = (times[9] - times[3]) / 6
    return out


def main():
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, TPU=dataclasses.replace(cfg.TPU, BUCKETS=((608, 1024),)))
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)

    stages = "--stages" in sys.argv
    net = "res50"
    if "--net" in sys.argv:
        net = sys.argv[sys.argv.index("--net") + 1]
    for batch in (1, 8):
        if stages and batch == 1:
            continue
        model = build_model(net, 21, cfg, dtype=dtype)
        data = pack_images(
            rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32),
            getattr(model, "input_block", 1))
        # gt padded to the PRODUCTION shape (TPU.MAX_GT) with a typical
        # valid count — the anchor-target IoU cost scales with the padded G,
        # so feeding fewer rows understates the real train loop (earlier
        # revisions of this script used g=8: numbers in docs before
        # PROFILE_r02 §6c-4 are on that lighter shape)
        g = cfg.TPU.MAX_GT
        valid = np.zeros((batch, g), bool)
        valid[:, :12] = True
        feed = {
            "data": jnp.asarray(data),
            "im_info": jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32),
                                (batch, 1)),
            "gt_boxes": jnp.asarray(
                rng.uniform(0, 400, (batch, g, 4)).astype(np.float32)),
            "gt_labels": jnp.asarray(
                rng.randint(1, 21, (batch, g)).astype(np.int32)),
            "gt_valid": jnp.asarray(valid),
        }
        # well-formed boxes
        b0 = np.asarray(feed["gt_boxes"])
        feed["gt_boxes"] = jnp.asarray(
            np.concatenate([np.minimum(b0[..., :2], b0[..., 2:] - 16),
                            np.maximum(b0[..., 2:], b0[..., :2] + 16)], -1))
        variables = model.init(jax.random.PRNGKey(0), feed["data"][:1],
                               feed["im_info"][:1])
        tx, _ = make_optimizer(model, variables["params"], cfg)
        state = {"params": variables["params"],
                 "opt_state": tx.init(variables["params"])}
        if stages:
            st = stage_times(model, state, feed)
            dt = step_time(model, tx, state, feed)
            print(f"batch {batch}: forward {st['forward'] * 1e3:6.2f} ms   "
                  f"fwd+bwd {st['fwd+bwd'] * 1e3:6.2f} ms   "
                  f"full step {dt * 1e3:6.2f} ms", flush=True)
        else:
            dt = step_time(model, tx, state, feed)
            print(f"batch {batch}: {dt * 1e3:7.2f} ms/step  "
                  f"({batch / dt:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
