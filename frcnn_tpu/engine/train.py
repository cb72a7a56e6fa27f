"""Training driver.

Rebuild of reference ``lib/model/train_val.py:~1-400`` (SURVEY.md #2):
SolverWrapper with SGD+momentum (DOUBLE_BIAS 2x lr on biases, BIAS_DECAY
off, weight decay on kernels), step decay at STEPSIZEs (GAMMA), snapshot /
auto-resume (find_previous/restore), roidb filtering and flip augmentation.

TPU-native differences:
  * the whole optimization step (forward, 4 losses, backward, SGD update)
    is ONE jitted function; the reference crosses host↔device ≥4x/step;
  * data parallelism: pass a Mesh — params replicate, batches shard on
    axis 0, the gradient all-reduce compiles to ICI psum;
  * snapshots via orbax (arrays) + a pkl sidecar (numpy RNG, data-layer
    cursor/permutation) — same exact-resume contract as the reference's
    .pth + .pkl pairs (SURVEY.md §3.4), and preemption-safe;
  * lr schedule is a pure function of the global step, so resume needs no
    STEPSIZE-list surgery (reference mutates the list on restore).
"""

from __future__ import annotations

import glob
import json
import os
import os.path as osp
import pickle
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from frcnn_tpu.config import Config
from frcnn_tpu.data.loader import RoIDataLayer
from frcnn_tpu.data.roidb import prepare_roidb
from frcnn_tpu.models.backbones import pack_images
from frcnn_tpu.utils.timer import Timer


# ---------------------------------------------------------------------------
# roidb assembly (reference train_val.get_training_roidb / filter_roidb,
# trainval_net.combined_roidb)
# ---------------------------------------------------------------------------


def get_training_roidb(imdb, cfg: Config):
    """Flip augmentation + metadata prep (reference get_training_roidb)."""
    if cfg.TRAIN.USE_FLIPPED:
        print("Appending horizontally-flipped training examples...")
        imdb.append_flipped_images()
        print("done")
    print("Preparing training data...")
    prepare_roidb(imdb)
    print("done")
    return imdb.roidb


def filter_roidb(roidb, cfg: Config):
    """Drop images without usable fg/bg rois (reference filter_roidb)."""
    t = cfg.TRAIN

    def is_valid(entry):
        overlaps = entry["max_overlaps"]
        fg = np.where(overlaps >= t.FG_THRESH)[0]
        bg = np.where((overlaps < t.BG_THRESH_HI) & (overlaps >= t.BG_THRESH_LO))[0]
        return len(fg) > 0 or len(bg) > 0

    num = len(roidb)
    filtered = [entry for entry in roidb if is_valid(entry)]
    print(f"Filtered {num - len(filtered)} roidb entries: {num} -> {len(filtered)}")
    return filtered


def combined_roidb(imdb_names: str, cfg: Config):
    """'+'-merged training roidbs (reference trainval_net.combined_roidb)."""
    from frcnn_tpu.data.factory import get_imdb

    def get_roidb(name):
        imdb = get_imdb(name, data_dir=cfg.DATA_DIR)
        print(f"Loaded dataset `{imdb.name}`")
        imdb.set_proposal_method(cfg.TRAIN.PROPOSAL_METHOD)
        return imdb, get_training_roidb(imdb, cfg)

    names = imdb_names.split("+")
    imdb, roidb = get_roidb(names[0])
    for name in names[1:]:
        _, r = get_roidb(name)
        roidb.extend(r)
    return imdb, roidb


# ---------------------------------------------------------------------------
# optimizer (reference SolverWrapper.construct_graph param groups)
# ---------------------------------------------------------------------------


def _param_labels(model, params) -> Any:
    """Label tree: 'frozen' | 'bias' | 'weight' per leaf.

    Frozen = the model's frozen_param policy says so (FrozenBatchNorm, fixed
    blocks); bias = trainable leaf named 'bias' (DOUBLE_BIAS lr, no decay).
    """
    cfg = model.config
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def put(d, path, val):
        node = d
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    out: dict = {}
    for path, _ in flat:
        names = tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        if model.frozen_param(names, cfg):
            label = "frozen"
        elif names[-1] == "bias":
            label = "bias"
        else:
            label = "weight"
        put(out, names, label)
    if isinstance(params, FrozenDict):
        return FrozenDict(out)
    return out


def stop_frozen_gradients(labels, params):
    """Reference ``requires_grad=False`` semantics (resnet_v1.py freezes
    FIXED_BLOCKS + every BN): stop_gradient on frozen leaves, so AD prunes
    their wgrads AND stops the backward below the deepest trainable layer
    (at FIXED_BLOCKS=1 nothing under layer2's input is differentiated —
    the stride-4 layer1, the most HBM-bound stage, drops out of the
    backward entirely).  The optimizer's set_to_zero group made these
    updates inert already; this stops paying for computing them.  Grads of
    stopped leaves come back as zeros, so tree shapes are unchanged."""
    return jax.tree.map(
        lambda lab, x: jax.lax.stop_gradient(x) if lab == "frozen" else x,
        labels, params)


def make_lr_schedule(cfg: Config):
    """Step decay: LEARNING_RATE * GAMMA^(#STEPSIZEs passed), with optional
    linear warmup (WARMUP_ITERS/WARMUP_FACTOR — needed for from-scratch
    training; off by default for reference parity)."""
    boundaries = {int(s): cfg.TRAIN.GAMMA for s in cfg.TRAIN.STEPSIZE}
    base = optax.piecewise_constant_schedule(cfg.TRAIN.LEARNING_RATE, boundaries)
    if cfg.TRAIN.WARMUP_ITERS <= 0:
        return base
    w = cfg.TRAIN.WARMUP_ITERS
    f = cfg.TRAIN.WARMUP_FACTOR

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step / w, 1.0)
        return base(step) * (f + (1.0 - f) * frac)

    return schedule


def make_optimizer(model, params, cfg: Config):
    """SGD+momentum with the reference's param groups (train_val.py:
    DOUBLE_BIAS → 2x lr on biases; BIAS_DECAY off → no weight decay on
    biases; frozen params get zero updates)."""
    schedule = make_lr_schedule(cfg)
    bias_scale = 2.0 if cfg.TRAIN.DOUBLE_BIAS else 1.0

    weight_tx = optax.chain(
        optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
        optax.trace(decay=cfg.TRAIN.MOMENTUM),
        optax.scale_by_schedule(lambda step: -schedule(step)),
    )
    bias_chain = [optax.trace(decay=cfg.TRAIN.MOMENTUM),
                  optax.scale_by_schedule(lambda step: -bias_scale * schedule(step))]
    if cfg.TRAIN.BIAS_DECAY:
        bias_chain.insert(0, optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY))
    bias_tx = optax.chain(*bias_chain)

    labels = _param_labels(model, params)
    tx = optax.multi_transform(
        {"weight": weight_tx, "bias": bias_tx, "frozen": optax.set_to_zero()},
        labels)
    if cfg.TRAIN.GRAD_CLIP > 0:
        # Frozen leaves (FrozenBatchNorm stats/affine, fixed blocks) carry
        # real — often large — gradients; zero them BEFORE the global-norm
        # clip, or the inflated norm over-clips the trainable grads.
        frozen = jax.tree.map(lambda lab: lab == "frozen", labels)
        tx = optax.chain(optax.masked(optax.set_to_zero(), frozen),
                         optax.clip_by_global_norm(cfg.TRAIN.GRAD_CLIP), tx)
    return tx, schedule


# ---------------------------------------------------------------------------
# SolverWrapper
# ---------------------------------------------------------------------------


class SolverWrapper:
    """Training orchestrator (reference SolverWrapper)."""

    def __init__(self, model, imdb, roidb, valroidb, output_dir: str,
                 tb_dir: str | None = None, cfg: Config | None = None,
                 mesh=None, pretrained_params=None):
        self.model = model
        self.imdb = imdb
        self.roidb = roidb
        self.valroidb = valroidb
        self.output_dir = output_dir
        self.tb_dir = tb_dir
        self.cfg = cfg or model.config
        self.mesh = mesh
        self.pretrained_params = pretrained_params
        os.makedirs(output_dir, exist_ok=True)

    # -- graph ----------------------------------------------------------------
    def construct_graph(self):
        cfg = self.cfg
        bh, bw = max(cfg.TPU.BUCKETS, key=lambda b: b[0] * b[1])
        b = cfg.TRAIN.IMS_PER_BATCH
        self._input_block = getattr(self.model, "input_block", 1)
        dummy = (pack_images(np.zeros((b, bh, bw, 3), np.float32),
                             self._input_block),
                 jnp.tile(jnp.asarray([[bh, bw, 1.0]], jnp.float32), (b, 1)))
        key = jax.random.PRNGKey(cfg.RNG_SEED)
        variables = self.model.init(key, *dummy)
        params = variables["params"]
        if self.pretrained_params is not None:
            params = _merge_pretrained(params, self.pretrained_params)
        self.tx, self.schedule = make_optimizer(self.model, params, cfg)
        opt_state = self.tx.init(params)
        self.state = {"params": params, "opt_state": opt_state,
                      "step": jnp.zeros((), jnp.int32)}
        if self.mesh is not None:
            from frcnn_tpu.parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)

        model, tx = self.model, self.tx
        labels = _param_labels(self.model, params)

        def train_step(state, data, im_info, gt_boxes, gt_labels, gt_valid, key):
            dkey, skey = jax.random.split(key)

            def loss_fn(params):
                p = stop_frozen_gradients(labels, params)
                losses, _aux = model.apply(
                    {"params": p}, data, im_info, gt_boxes, gt_labels,
                    gt_valid, skey, method="train_forward",
                    rngs={"dropout": dkey})
                return losses["total_loss"], losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"])
            updates, opt_state = tx.update(grads, state["opt_state"],
                                           state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {"params": params, "opt_state": opt_state,
                         "step": state["step"] + 1}
            return new_state, losses

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        def eval_step(state, data, im_info, gt_boxes, gt_labels, gt_valid, key):
            dkey, skey = jax.random.split(key)
            losses, _ = model.apply(
                {"params": state["params"]}, data, im_info, gt_boxes,
                gt_labels, gt_valid, skey, method="train_forward",
                rngs={"dropout": dkey})
            return state, losses

        self._eval_step = jax.jit(eval_step)
        self.base_key = jax.random.PRNGKey(cfg.RNG_SEED + 1)
        return self.state

    # -- snapshots (reference snapshot/from_snapshot/find_previous) -----------
    def _ckpt_path(self, step: int) -> str:
        return osp.join(self.output_dir,
                        f"{self.cfg.TRAIN.SNAPSHOT_PREFIX}_iter_{step}")

    def snapshot(self, step: int):
        import orbax.checkpoint as ocp

        path = self._ckpt_path(step)
        state_np = jax.tree.map(np.asarray, self.state)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(osp.abspath(path) + ".ckpt", state_np)
        ckptr.wait_until_finished()
        # sidecar: exact-resume host state (reference .pkl)
        # prefetch runs ahead of training: snapshot the state as of the
        # last CONSUMED batch, not the loader's live (ahead) cursor
        layer_state = getattr(self, "_layer_state_consumed", None)
        if layer_state is None:
            layer_state = self.data_layer.get_state()
        with open(path + ".pkl", "wb") as f:
            pickle.dump({
                "iter": step,
                "np_rng": np.random.get_state(),
                "layer_state": layer_state,
                "val_layer_state": self.data_layer_val.get_state()
                if self.data_layer_val else None,
            }, f)
        print(f"Wrote snapshot to: {path}.ckpt")
        self._prune_snapshots()
        return path

    def _prune_snapshots(self):
        kept = self.cfg.TRAIN.SNAPSHOT_KEPT
        if not kept:
            return
        pkls = sorted(
            glob.glob(osp.join(self.output_dir,
                               f"{self.cfg.TRAIN.SNAPSHOT_PREFIX}_iter_*.pkl")),
            key=lambda p: int(p.rsplit("_", 1)[1][:-4]))
        for p in pkls[:-kept]:
            os.remove(p)
            ck = p[:-4] + ".ckpt"
            if osp.exists(ck):
                import shutil

                shutil.rmtree(ck, ignore_errors=True)

    def find_previous(self):
        pkls = sorted(
            glob.glob(osp.join(self.output_dir,
                               f"{self.cfg.TRAIN.SNAPSHOT_PREFIX}_iter_*.pkl")),
            key=lambda p: int(p.rsplit("_", 1)[1][:-4]))
        return pkls[-1] if pkls else None

    def from_snapshot(self, pkl_path: str):
        import orbax.checkpoint as ocp

        with open(pkl_path, "rb") as f:
            meta = pickle.load(f)
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, self.state)
        self.state = ckptr.restore(osp.abspath(pkl_path[:-4]) + ".ckpt", target)
        if self.mesh is not None:
            from frcnn_tpu.parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
        np.random.set_state(meta["np_rng"])
        self.data_layer.set_state(meta["layer_state"])
        if self.data_layer_val and meta.get("val_layer_state"):
            self.data_layer_val.set_state(meta["val_layer_state"])
        print(f"Restored from {pkl_path} (iter {meta['iter']})")
        return meta["iter"]

    def _gt_overlay(self, blobs):
        """First image of the batch with its gt boxes drawn (uint8 RGB), for
        the tensorboard image summary the reference emits every
        SUMMARY_INTERVAL."""
        from frcnn_tpu.utils.visualization import draw_bounding_boxes

        im = np.asarray(blobs["data"][0])[:, :, ::-1]  # BGR raw → RGB
        im = np.clip(im, 0, 255).astype(np.uint8)
        v = np.asarray(blobs["gt_valid"][0])
        names = list(getattr(self.imdb, "classes", [])) or None
        return draw_bounding_boxes(
            im, np.asarray(blobs["gt_boxes"][0])[v],
            labels=np.asarray(blobs["gt_labels"][0])[v], class_names=names)

    # -- loop -----------------------------------------------------------------
    def train_model(self, max_iters: int):
        cfg = self.cfg
        if cfg.TPU.DEBUG_NANS:
            jax.config.update("jax_debug_nans", True)
        reader = None
        if cfg.TRAIN.IMAGE_CACHE:
            # decode+resize-once memmap cache: the single-core host otherwise
            # spends ~0.5 s/image in cv2 vs the ~40 ms device step; cached
            # resized uint8 images cut the steady-state host work to a
            # pad-copy (data/cache.py::ResizedImageCache)
            from frcnn_tpu.data.cache import ResizedImageCache

            paths = [r["image"] for r in self.roidb]
            if self.valroidb is not None:
                paths += [r["image"] for r in self.valroidb]
            # dataset-level location (like the roidb pkl caches) so multiple
            # experiments share one decode, not one copy per output_dir
            reader = ResizedImageCache.build(
                paths, osp.join(self.imdb.cache_path,
                                f"{self.imdb.name}_resized"),
                targets=cfg.TRAIN.SCALES, max_size=cfg.TRAIN.MAX_SIZE,
                buckets=cfg.TPU.BUCKETS)
        self.data_layer = RoIDataLayer(self.roidb, cfg, reader=reader)
        self.data_layer_val = (
            RoIDataLayer(self.valroidb, cfg, random=True, reader=reader)
            if self.valroidb is not None else None)
        self.construct_graph()

        last_snapshot = self.find_previous()
        start = self.from_snapshot(last_snapshot) if last_snapshot else 0

        log_path = osp.join(self.output_dir, "train_log.jsonl")
        log_f = open(log_path, "a")
        writer = None
        if self.tb_dir:
            from frcnn_tpu.utils.summary import SummaryWriter

            writer = SummaryWriter(self.tb_dir)
        timer = Timer()
        last_summary = time.time()
        profiling = False

        # Background prefetch: overlap host-side minibatch assembly (cv2
        # decode + resize on this box's single CPU core) with the device
        # step.  One-deep queue keeps the exact data order (and therefore
        # the exact-resume contract) intact.
        import queue as _queue
        import threading

        batch_q: _queue.Queue = _queue.Queue(maxsize=2)
        stop_flag = threading.Event()
        n_needed = max_iters - start

        def _producer():
            # each item carries the loader state AFTER generating it, so a
            # snapshot taken at step k resumes with batch k+1 exactly even
            # though the producer runs ahead (exact-resume contract)
            try:
                for _ in range(n_needed):
                    if stop_flag.is_set():
                        return
                    blobs = self.data_layer.forward()
                    batch_q.put((blobs, self.data_layer.get_state()))
            except BaseException as e:  # surface in the consumer, don't hang
                batch_q.put(e)

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        step = start
        while step < max_iters:
            # profiler window (SURVEY.md §5.1: jax.profiler + Perfetto trace)
            if cfg.TPU.PROFILE_DIR and step == cfg.TPU.PROFILE_START:
                jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
                profiling = True
            if profiling and step == cfg.TPU.PROFILE_START + cfg.TPU.PROFILE_STEPS:
                jax.block_until_ready(self.state)
                jax.profiler.stop_trace()
                profiling = False
                print(f"wrote profiler trace to {cfg.TPU.PROFILE_DIR}")

            timer.tic()
            item = batch_q.get()
            if isinstance(item, BaseException):
                raise RuntimeError("data prefetch thread failed") from item
            blobs, self._layer_state_consumed = item
            # keep raw blobs for the gt-overlay summary; feed the device the
            # host-packed layout the backbone prefers (pack_images is a free
            # numpy view)
            feed = {**blobs, "data": pack_images(blobs["data"],
                                                 self._input_block)}
            if self.mesh is not None:
                from frcnn_tpu.parallel.mesh import shard_batch

                feed = shard_batch(feed, self.mesh)
            key = jax.random.fold_in(self.base_key, step)
            self.state, losses = self._train_step(
                self.state, feed["data"], feed["im_info"], feed["gt_boxes"],
                feed["gt_labels"], feed["gt_valid"], key)
            step += 1
            if step % cfg.TRAIN.DISPLAY == 0:
                losses = jax.tree.map(float, losses)
                timer.toc()
                lr = float(self.schedule(step))
                print(f"iter: {step} / {max_iters}, total loss: "
                      f"{losses['total_loss']:.6f}\n"
                      f" >>> rpn_loss_cls: {losses['rpn_cross_entropy']:.6f}\n"
                      f" >>> rpn_loss_box: {losses['rpn_loss_box']:.6f}\n"
                      f" >>> loss_cls: {losses['cross_entropy']:.6f}\n"
                      f" >>> loss_box: {losses['loss_box']:.6f}\n"
                      f" >>> lr: {lr:f}")
                print(f"speed: {timer.average_time:.3f}s / iter")
                log_f.write(json.dumps({"iter": step, "ts": time.time(),
                                        "lr": lr, **losses}) + "\n")
                log_f.flush()
                if writer is not None:
                    writer.scalars({**losses, "lr": lr,
                                    "speed_s_per_iter": timer.average_time}, step)
            else:
                timer.toc()
            if step % cfg.TRAIN.SNAPSHOT_ITERS == 0:
                self.snapshot(step)
            if ((self.data_layer_val is not None or writer is not None)
                    and time.time() - last_summary > cfg.TRAIN.SUMMARY_INTERVAL):
                # summaries (reference train_step_with_summary): val losses +
                # a ground-truth overlay image (reference network.py
                # _add_gt_image_summary / utils/visualization.py)
                if writer is not None:
                    writer.image("ground_truth",
                                 self._gt_overlay(blobs), step)
                if self.data_layer_val is not None:
                    vblobs = self.data_layer_val.forward()
                    vblobs = {**vblobs,
                              "data": pack_images(vblobs["data"],
                                                  self._input_block)}
                    if self.mesh is not None:
                        from frcnn_tpu.parallel.mesh import shard_batch

                        vblobs = shard_batch(vblobs, self.mesh)
                    _, vloss = self._eval_step(
                        self.state, vblobs["data"], vblobs["im_info"],
                        vblobs["gt_boxes"], vblobs["gt_labels"],
                        vblobs["gt_valid"],
                        jax.random.fold_in(self.base_key, 10**9 + step))
                    vloss = jax.tree.map(float, vloss)
                    if writer is not None:
                        writer.scalars(
                            {f"val/{k}": v for k, v in vloss.items()}, step)
                    log_f.write(json.dumps(
                        {"iter": step,
                         **{f"val_{k}": v for k, v in vloss.items()}}) + "\n")
                last_summary = time.time()
        if profiling:
            jax.profiler.stop_trace()
        stop_flag.set()
        while not batch_q.empty():  # unblock a producer waiting on put()
            batch_q.get_nowait()
        if step > start and step % cfg.TRAIN.SNAPSHOT_ITERS != 0:
            self.snapshot(step)
        if writer is not None:
            writer.close()
        log_f.close()
        return self.state


def train_net(model, imdb, roidb, valroidb, output_dir: str,
              tb_dir: str | None = None, cfg: Config | None = None,
              pretrained_params=None, max_iters: int = 40000, mesh=None):
    """Train entry point (reference train_val.train_net)."""
    cfg = cfg or model.config
    frozen_resnet = (
        type(getattr(model, "backbone", None)).__name__ == "ResNetV1"
        or (type(model).__name__ == "FasterRCNNFPN"
            and getattr(model, "norm", "frozen_bn") == "frozen_bn"))
    if pretrained_params is None and frozen_resnet:
        # Frozen-BN backbones (the reference's convention, resnet_v1.py:
        # all BN eval-mode) normalize nothing at random init — from-scratch
        # training at the reference lr typically NaNs within iterations.
        print("WARNING: no pretrained weights and a frozen-BN backbone — "
              "the reference design assumes ImageNet initialization.  For "
              "from-scratch training use a *_fpn_gn net (GroupNorm) or set "
              "TRAIN.WARMUP_ITERS/GRAD_CLIP and a lower LEARNING_RATE.")
    roidb = filter_roidb(roidb, cfg)
    valroidb = filter_roidb(valroidb, cfg) if valroidb is not None else None
    sw = SolverWrapper(model, imdb, roidb, valroidb, output_dir, tb_dir,
                       cfg=cfg, mesh=mesh, pretrained_params=pretrained_params)
    print("Solving...")
    state = sw.train_model(max_iters)
    print("done solving")
    return state


def _merge_pretrained(params, pretrained):
    """Graft pretrained leaves (by matching path) onto the init tree."""
    flat_init = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_pre = jax.tree_util.tree_flatten_with_path(pretrained)[0]
    merged = dict(flat_init)
    n = 0
    for path, leaf in flat_pre:
        if path in flat_init and flat_init[path].shape == leaf.shape:
            merged[path] = leaf
            n += 1
    print(f"Loaded {n}/{len(flat_pre)} pretrained tensors")
    treedef = jax.tree_util.tree_structure(params)
    order = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, order)
