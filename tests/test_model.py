"""Detector assembly smoke tests (CPU, tiny configs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import default_config
from frcnn_tpu.models import build_model

pytestmark = pytest.mark.slow  # module fixture compiles the full model (~14 s); smoke-tier coverage comes from the op-level tests


def small_cfg():
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        # quarter width: these tests assert graph shapes/finiteness, which
        # depend on num_classes and the proposal caps, not channel widths
        MOBILENET=dataclasses.replace(cfg.MOBILENET, DEPTH_MULTIPLIER=0.25),
        TEST=dataclasses.replace(cfg.TEST, RPN_PRE_NMS_TOP_N=256,
                                 RPN_POST_NMS_TOP_N=32, MAX_PER_IMAGE=10),
        TRAIN=dataclasses.replace(cfg.TRAIN, RPN_PRE_NMS_TOP_N=256,
                                  RPN_POST_NMS_TOP_N=64, BATCH_SIZE=32,
                                  RPN_BATCHSIZE=64),
    )


@pytest.fixture(scope="module")
def mobile_model():
    cfg = small_cfg()
    model = build_model("mobile", 21, cfg)
    images = jnp.zeros((1, 320, 320, 3), jnp.float32)
    im_info = jnp.array([[320.0, 320.0, 1.0]])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, im_info)
    return model, variables


def test_predict_shapes(mobile_model):
    model, variables = mobile_model
    images = jnp.zeros((2, 320, 320, 3), jnp.float32)
    im_info = jnp.array([[320.0, 320.0, 1.0], [280.0, 300.0, 1.0]])
    out = jax.jit(lambda v, im, ii: model.apply(v, im, ii, method="predict"))(
        variables, images, im_info)
    assert out["rois"].shape == (2, 32, 4)
    assert out["cls_prob"].shape == (2, 32, 21)
    assert out["bbox_pred"].shape == (2, 32, 84)
    p = np.asarray(out["cls_prob"])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_detect_shapes_and_validity(mobile_model):
    model, variables = mobile_model
    images = jnp.zeros((1, 320, 320, 3), jnp.float32)
    im_info = jnp.array([[320.0, 320.0, 1.0]])
    det, valid = jax.jit(lambda v, im, ii: model.apply(v, im, ii, method="detect"))(
        variables, images, im_info)
    det, valid = np.asarray(det), np.asarray(valid)
    assert det.shape == (1, 10, 6) and valid.shape == (1, 10)
    d = det[0][valid[0]]
    assert (d[:, 4] > 0).all()                 # scores positive
    assert (d[:, 5] >= 1).all()                # background never emitted
    assert (d[:, 2] >= d[:, 0]).all() and (d[:, 3] >= d[:, 1]).all()
    # scores sorted descending (global top-k)
    assert (np.diff(d[:, 4]) <= 1e-6).all()


@pytest.mark.slow
def test_train_forward_losses_and_grads(mobile_model):
    model, variables = mobile_model
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 320, 320, 3)) * 255
    im_info = jnp.array([[320.0, 320.0, 1.0]])
    gt = jnp.array([[[10.0, 10.0, 160.0, 180.0], [100.0, 140.0, 300.0, 310.0],
                     [0.0, 0.0, 0.0, 0.0]]])
    gl = jnp.array([[3, 7, 0]])
    gv = jnp.array([[True, True, False]])

    def loss_fn(params):
        losses, aux = model.apply({"params": params}, images, im_info, gt, gl, gv,
                                  jax.random.PRNGKey(2), method="train_forward",
                                  rngs={"dropout": jax.random.PRNGKey(3)})
        return losses["total_loss"], (losses, aux)

    (total, (losses, aux)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    # init-time loss values: rpn CE ≈ log2, roi CE ≈ log21
    assert abs(float(losses["rpn_cross_entropy"]) - np.log(2)) < 0.2
    assert abs(float(losses["cross_entropy"]) - np.log(21)) < 0.3
    assert float(total) > 0
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0
    assert int(aux["n_fg"]) > 0


def test_train_forward_batch2(mobile_model):
    # batched images with different actual sizes inside one padded bucket
    model, variables = mobile_model
    images = jax.random.uniform(jax.random.PRNGKey(4), (2, 320, 320, 3)) * 255
    im_info = jnp.array([[320.0, 320.0, 1.0], [256.0, 288.0, 1.0]])
    gt = jnp.tile(jnp.array([[[20.0, 20.0, 150.0, 150.0]]]), (2, 1, 1))
    gl = jnp.ones((2, 1), jnp.int32)
    gv = jnp.ones((2, 1), bool)
    losses, aux = jax.jit(
        lambda v, *a: model.apply(v, *a, method="train_forward",
                                  rngs={"dropout": jax.random.PRNGKey(5)})
    )(variables, images, im_info, gt, gl, gv, jax.random.PRNGKey(6))
    assert np.isfinite(float(losses["total_loss"]))


def test_vgg16_and_resnet_build():
    # heavier backbones: init only (shape/wiring check)
    cfg = small_cfg()
    for net, tail_dim in (("vgg16", 4096), ("res50", 2048)):
        model = build_model(net, 21, cfg)
        images = jnp.zeros((1, 160, 160, 3), jnp.float32)
        im_info = jnp.array([[160.0, 160.0, 1.0]])
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), images, im_info))
        names = set(variables["params"].keys())
        assert "rpn_net" in names and "cls_score" in names
