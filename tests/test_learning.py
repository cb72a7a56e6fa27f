"""Learning-dynamics regression tests.

These exist because a silent init bug (depthwise conv fan_out variance →
~50x-too-small weights → trunk output exactly zero by layer 4) let every
shape/loss/grad test pass while the network was unable to learn anything
through the trunk.  Shape tests don't catch dead networks; these do.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from frcnn_tpu.config import default_config
from frcnn_tpu.models import build_model
from frcnn_tpu.models.backbones import build_backbone


@pytest.mark.parametrize("net", ["mobile", "vgg16", "res50"])
def test_trunk_alive_at_init(net):
    """Backbone features at init must neither vanish nor explode."""
    cfg = default_config()
    backbone = build_backbone(net, cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    variables = jax.eval_shape  # silence lint
    params = jax.jit(backbone.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 128, 128, 3)))
    feat = jax.jit(lambda p, xx: backbone.apply(
        p, xx, method="extract_features"))(params, x)
    std = float(jnp.std(feat))
    assert std > 1e-4, f"{net} trunk is dead at init (std={std})"
    assert std < 1e4, f"{net} trunk explodes at init (std={std})"
    # spatial structure must survive: different cells → different features
    spatial_std = float(jnp.std(jnp.mean(feat, axis=-1)))
    assert spatial_std > 1e-6, f"{net} trunk output is spatially constant"


@pytest.mark.slow
def test_rpn_learns_fg_anchor():
    """300 overfit steps on one image: the RPN must assign high fg prob to
    the gt-overlapping anchor (catches label/score misalignment AND dead
    trunks — an untrainable RPN still shows decreasing losses via biases)."""
    from frcnn_tpu.engine.train import make_optimizer
    from frcnn_tpu.ops.anchors import generate_anchors_pre
    from frcnn_tpu.ops.boxes import bbox_overlaps

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TRAIN=dataclasses.replace(cfg.TRAIN, RPN_PRE_NMS_TOP_N=256,
                                  RPN_POST_NMS_TOP_N=64, BATCH_SIZE=32,
                                  RPN_BATCHSIZE=64, LEARNING_RATE=0.02,
                                  STEPSIZE=(10000,)),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((96, 96),), MAX_GT=4,
                                PIXEL_SCALE=1 / 128.0),
        ANCHOR_SCALES=(2.0, 4.0),
        # width 0.25: a one-image RPN overfit needs no capacity, and the
        # quarter-width net cuts the 1-core CPU step ~4x (early-exit logic
        # below absorbs the slightly slower convergence of the narrow net)
        MOBILENET=dataclasses.replace(cfg.MOBILENET, FIXED_LAYERS=0,
                                      DEPTH_MULTIPLIER=0.25))
    model = build_model("mobile", 4, cfg)
    im = np.full((1, 96, 96, 3), 30.0, np.float32)
    im[0, 16:56, 20:70] = 220.0
    ii = jnp.array([[96.0, 96.0, 1.0]])
    gt = jnp.array([[[20.0, 16.0, 69.0, 55.0], [0, 0, 0, 0]]], jnp.float32)
    gl = jnp.array([[2, 0]])
    gv = jnp.array([[True, False]])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(im), ii)
    params = variables["params"]
    tx, _ = make_optimizer(model, params, cfg)
    state = {"p": params, "o": tx.init(params)}

    @jax.jit
    def step(state, key):
        def loss_fn(p):
            losses, _ = model.apply({"params": p}, jnp.asarray(im), ii, gt, gl,
                                    gv, key, method="train_forward")
            return losses["total_loss"], losses

        (_, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(state["p"])
        u, o = tx.update(g, state["o"], state["p"])
        return {"p": optax.apply_updates(state["p"], u), "o": o}, losses

    anchors, _ = generate_anchors_pre(6, 6, 16, scales=(2.0, 4.0))
    ov = np.asarray(bbox_overlaps(anchors, gt[0, :1])).max(axis=1)

    def fg_probs(m):
        f = m.backbone.extract_features(m._preprocess(jnp.asarray(im)))
        return m._rpn(f)[1]

    def converged(state, losses, first):
        """The final assertions, with margin — used as the early-exit test so
        a converged run stops without waiting out all 300 steps."""
        if not (float(losses["total_loss"]) < 0.28 * first
                and float(losses["rpn_cross_entropy"]) < 0.04):
            return False
        prob = np.asarray(model.apply({"params": state["p"]},
                                      method=lambda m: fg_probs(m))[0])
        return (prob[ov >= 0.5].mean() > 0.92
                and prob[ov >= 0.5].mean() > prob[ov < 0.3].mean() + 0.35)

    first = None
    for i in range(300):
        state, losses = step(state, jax.random.PRNGKey(1))
        if first is None:
            first = float(losses["total_loss"])
        if i >= 80 and i % 20 == 0 and converged(state, losses, first):
            break
    last = float(losses["total_loss"])
    assert last < 0.3 * first, f"no overfit: {first} -> {last}"
    assert float(losses["rpn_cross_entropy"]) < 0.05

    prob = np.asarray(model.apply({"params": state["p"]},
                                  method=lambda m: fg_probs(m))[0])
    assert prob[ov >= 0.5].mean() > 0.9, "RPN did not learn the fg anchor"
    assert prob[ov >= 0.5].mean() > prob[ov < 0.3].mean() + 0.3
