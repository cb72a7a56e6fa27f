"""FPN detector (BASELINE config 3): pyramid shapes, level assignment,
end-to-end predict/detect/train_forward, optimizer masks."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import default_config
from frcnn_tpu.models import build_model

pytestmark = pytest.mark.slow  # module fixture builds/compiles an FPN (~25 s)


def fpn_cfg():
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, RPN_POST_NMS_TOP_N=32,
                                 MAX_PER_IMAGE=10),
        TRAIN=dataclasses.replace(cfg.TRAIN, RPN_POST_NMS_TOP_N=64,
                                  BATCH_SIZE=32, RPN_BATCHSIZE=64),
        FPN=dataclasses.replace(cfg.FPN, PRE_NMS_PER_LEVEL_TRAIN=128,
                                PRE_NMS_PER_LEVEL_TEST=64),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((256, 256),)),
    )


@pytest.fixture(scope="module")
def fpn_model():
    cfg = fpn_cfg()
    model = build_model("res50_fpn", 21, cfg)
    images = jnp.zeros((1, 256, 256, 3), jnp.float32)
    im_info = jnp.array([[256.0, 256.0, 1.0]])
    # jitted: the eager op-by-op init costs ~25 s on this 1-core box
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, im_info)
    return model, variables, cfg


def test_pyramid_shapes(fpn_model):
    model, variables, cfg = fpn_model
    images = jnp.zeros((1, 256, 256, 3), jnp.float32)
    pyr = jax.jit(lambda v, im: model.apply(v, im, method="_pyramid"))(
        variables, images)
    shapes = [tuple(p.shape) for p in pyr]
    assert shapes == [
        (1, 64, 64, 256),   # P2 stride 4
        (1, 32, 32, 256),   # P3 stride 8
        (1, 16, 16, 256),   # P4 stride 16
        (1, 8, 8, 256),     # P5 stride 32
        (1, 4, 4, 256),     # P6 stride 64
    ]


def test_level_assignment(fpn_model):
    model, _, cfg = fpn_model
    rois = jnp.asarray([
        [0, 0, 31, 31],        # 32px → P2
        [0, 0, 111, 111],      # 112px → P3
        [0, 0, 223, 223],      # 224px → P4
        [0, 0, 447, 447],      # 448px → P5
        [0, 0, 1000, 1000],    # huge → clamp P5
        [0, 0, 7, 7],          # tiny → clamp P2
    ], dtype=jnp.float32)
    levels = np.asarray(model._assign_levels(rois))
    np.testing.assert_array_equal(levels, [2, 3, 4, 5, 5, 2])


def test_fpn_predict_and_detect(fpn_model):
    model, variables, cfg = fpn_model
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3)) * 255
    im_info = jnp.array([[256.0, 256.0, 1.0]])
    out = jax.jit(lambda v, im, ii: model.apply(v, im, ii, method="predict"))(
        variables, images, im_info)
    assert out["rois"].shape == (1, 32, 4)
    assert out["cls_prob"].shape == (1, 32, 21)
    np.testing.assert_allclose(np.asarray(out["cls_prob"]).sum(-1), 1.0, rtol=1e-4)
    det, valid = jax.jit(lambda v, im, ii: model.apply(v, im, ii, method="detect"))(
        variables, images, im_info)
    assert det.shape == (1, 10, 6)
    assert np.isfinite(np.asarray(det)).all()


def test_fpn_propose_smoke(fpn_model):
    """_propose end-to-end through the model (the selection logic itself is
    oracle-tested in tests/test_proposals.py::test_fpn_select_pre_nms)."""
    model, variables, cfg = fpn_model
    images = jax.random.uniform(jax.random.PRNGKey(7), (1, 256, 256, 3)) * 255
    im_info = jnp.array([[256.0, 256.0, 1.0]])

    def run(mdl, im, ii):
        pyr = mdl._pyramid(im)
        _, prob, _, cells, _ = mdl._rpn_all_levels(pyr)
        anchors = mdl._anchors(pyr)
        return mdl._propose(pyr, prob, cells, anchors, ii, train=False)

    rois, scores, valid = jax.jit(
        lambda v, im, ii: model.apply(v, im, ii, method=run))(
        variables, images, im_info)
    assert np.isfinite(np.asarray(rois)).all()
    assert np.asarray(valid).any()


def test_fpn_prob_amajor_matches_cls_rows(fpn_model):
    """fg_prob is produced A-MAJOR per level by a transposed weight-diff
    matmul; the per-anchor cls rows stay A-minor.  Assert the two agree
    under the index remap _propose relies on: prob[a*HW+cell] ==
    sigmoid(cls[cell*A+a, 1] - cls[cell*A+a, 0])."""
    model, variables, cfg = fpn_model
    images = jax.random.uniform(jax.random.PRNGKey(9), (1, 256, 256, 3)) * 255

    def run(mdl, im):
        pyr = mdl._pyramid(im)
        cls, prob, _, _, _ = mdl._rpn_all_levels(pyr)
        return cls, prob

    # NOT jitted: the oracle recomputes sigmoid from the cls rows at
    # rtol 1e-4, and jit fuses the two output paths differently enough to
    # break that near the frozen-BN init's saturated logits
    cls, prob = model.apply(variables, images, method=run)
    a_n = model._A
    sizes = [(256 // 2 ** lv) ** 2 * a_n for lv in range(2, 7)]
    cls = np.asarray(cls)
    prob = np.asarray(prob)
    off = 0
    for s in sizes:
        hw = s // a_n
        p_lvl = prob[:, off:off + s].reshape(-1, a_n, hw)        # [a, cell]
        c_lvl = cls[:, off:off + s].reshape(-1, hw, a_n, 2)      # [cell, a]
        with np.errstate(over="ignore"):  # exp overflow → sigmoid saturates
            want = 1.0 / (1.0 + np.exp(-(c_lvl[..., 1] - c_lvl[..., 0])))
        # rtol 1e-3: the two paths compute d = fg−bg differently (transposed
        # weight-diff einsum vs conv rows) and the frozen-BN init's large
        # activations amplify the f32 gap to ~3e-4 on a few mid-range
        # logits; an index-remap BUG mismatches by O(1), not 1e-4
        np.testing.assert_allclose(p_lvl.transpose(0, 2, 1), want,
                                   rtol=1e-3, atol=1e-5)
        off += s


def test_fpn_train_forward_and_grads(fpn_model):
    model, variables, cfg = fpn_model
    images = jax.random.uniform(jax.random.PRNGKey(2), (1, 256, 256, 3)) * 255
    im_info = jnp.array([[256.0, 256.0, 1.0]])
    gt = jnp.array([[[10.0, 10.0, 120.0, 140.0], [60.0, 80.0, 240.0, 250.0]]])
    gl = jnp.array([[3, 7]])
    gv = jnp.array([[True, True]])

    def loss_fn(params):
        losses, aux = model.apply({"params": params}, images, im_info, gt, gl,
                                  gv, jax.random.PRNGKey(3),
                                  method="train_forward")
        return losses["total_loss"], (losses, aux)

    (total, (losses, aux)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    # NOTE: with from-scratch weights the frozen-BN resnet trunk produces
    # large activations (identity affine — like the reference, ResNet paths
    # expect pretrained backbones); check finiteness, not init-CE value.
    assert np.isfinite(float(total)) and float(total) > 0
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert int(aux["n_fg"]) > 0
    # gradient reaches the neck levels this image exercises (256px: P5/P6
    # anchors all fall outside the image and no roi reaches level 5, so
    # output5 may legitimately get zero gradient)
    neck = grads["neck"]
    for name in ("lateral2", "lateral4", "output2", "output4"):
        total_g = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(neck[name]))
        assert total_g > 0, name


def test_fpn_optimizer_masks(fpn_model):
    from frcnn_tpu.engine.train import make_optimizer

    model, variables, cfg = fpn_model
    params = variables["params"]
    tx, _ = make_optimizer(model, params, cfg)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    import jax.tree_util as jtu

    n_frozen = 0
    for path, u in jtu.tree_flatten_with_path(updates)[0]:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if model.frozen_param(names, cfg):
            assert float(jnp.abs(u).max()) == 0.0, names
            n_frozen += 1
    assert n_frozen > 50  # all the FrozenBatchNorms + fixed stage
