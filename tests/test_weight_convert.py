"""torch → flax weight conversion fidelity (SURVEY.md hard part #5).

Builds random torchvision-named state_dicts, converts them, and checks
numerical parity between a functional torch forward and the flax backbone
with converted params — including the VGG fc6 CHW→HWC flatten permutation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frcnn_tpu.config import default_config  # noqa: E402
from frcnn_tpu.models.backbones import ResNetV1, VGG16  # noqa: E402
from frcnn_tpu.utils.weight_convert import convert_resnet, convert_vgg16  # noqa: E402


def _rand(*shape):
    return torch.randn(*shape) * 0.1


# ---------------------------------------------------------------------------
# ResNet-50
# ---------------------------------------------------------------------------

_BLOCKS = (3, 4, 6, 3)


def _resnet50_state_dict(rng):
    torch.manual_seed(0)
    sd = {"conv1.weight": _rand(64, 3, 7, 7)}
    for s in ("weight", "bias", "running_mean"):
        sd[f"bn1.{s}"] = _rand(64)
    sd["bn1.running_var"] = torch.rand(64) + 0.5
    cin = 64
    for li, (n, width) in enumerate(zip(_BLOCKS, (64, 128, 256, 512)), start=1):
        for bi in range(n):
            p = f"layer{li}.{bi}"
            sd[f"{p}.conv1.weight"] = _rand(width, cin, 1, 1)
            sd[f"{p}.conv2.weight"] = _rand(width, width, 3, 3)
            sd[f"{p}.conv3.weight"] = _rand(width * 4, width, 1, 1)
            for ci, ch in ((1, width), (2, width), (3, width * 4)):
                for s in ("weight", "bias", "running_mean"):
                    sd[f"{p}.bn{ci}.{s}"] = _rand(ch)
                sd[f"{p}.bn{ci}.running_var"] = torch.rand(ch) + 0.5
            if bi == 0:
                sd[f"{p}.downsample.0.weight"] = _rand(width * 4, cin, 1, 1)
                for s in ("weight", "bias", "running_mean"):
                    sd[f"{p}.downsample.1.{s}"] = _rand(width * 4)
                sd[f"{p}.downsample.1.running_var"] = torch.rand(width * 4) + 0.5
            cin = width * 4
    return sd


def _bn_t(x, sd, p, eps=1e-5):
    return F.batch_norm(x, sd[p + ".running_mean"], sd[p + ".running_var"],
                        sd[p + ".weight"], sd[p + ".bias"], False, 0.0, eps)


def _bottleneck_t(x, sd, p, stride):
    idt = x
    y = F.relu(_bn_t(F.conv2d(x, sd[p + ".conv1.weight"]), sd, p + ".bn1"))
    y = F.relu(_bn_t(F.conv2d(y, sd[p + ".conv2.weight"], stride=stride,
                              padding=1), sd, p + ".bn2"))
    y = _bn_t(F.conv2d(y, sd[p + ".conv3.weight"]), sd, p + ".bn3")
    if p + ".downsample.0.weight" in sd:
        idt = _bn_t(F.conv2d(x, sd[p + ".downsample.0.weight"], stride=stride),
                    sd, p + ".downsample.1")
    return F.relu(y + idt)


def _resnet50_trunk_t(x, sd):
    x = F.relu(_bn_t(F.conv2d(x, sd["conv1.weight"], stride=2, padding=3),
                     sd, "bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    for li, (n, stride) in enumerate(zip(_BLOCKS[:3], (1, 2, 2)), start=1):
        for bi in range(n):
            x = _bottleneck_t(x, sd, f"layer{li}.{bi}", stride if bi == 0 else 1)
    return x


def test_resnet50_conversion_parity(rng):
    sd = _resnet50_state_dict(rng)
    converted = convert_resnet({k: v.numpy() for k, v in sd.items()}, 50)

    model = ResNetV1(depth=50)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    # init with a >=112px image (the __call__ init path crops a 7x7 cell)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    # graft converted trunk/tail
    params = dict(variables["params"])
    assert set(converted["trunk"].keys()) == set(params["trunk"].keys())
    assert set(converted["tail"].keys()) == set(params["tail"].keys())
    params["trunk"] = converted["trunk"]
    params["tail"] = converted["tail"]

    got = np.asarray(jax.jit(lambda pp, xx: model.apply(
        pp, xx, method="extract_features"))({"params": params},
                                            jnp.asarray(x)))
    want = _resnet50_trunk_t(torch.from_numpy(x).permute(0, 3, 1, 2), sd)
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape  # (1, 4, 4, 1024)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# VGG-16 (incl. fc6 flatten permutation)
# ---------------------------------------------------------------------------

_VGG_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_CH = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)


def _vgg16_state_dict():
    torch.manual_seed(1)
    sd = {}
    cin = 3
    for idx, ch in zip(_VGG_IDX, _VGG_CH):
        # fan-in normalized so activations stay O(1) over 13 layers (raw
        # 0.1-std weights compound to ~1e6 and amplify fp32 noise)
        sd[f"features.{idx}.weight"] = torch.randn(ch, cin, 3, 3) * (9 * cin) ** -0.5 * 1.5
        sd[f"features.{idx}.bias"] = _rand(ch)
        cin = ch
    sd["classifier.0.weight"] = _rand(4096, 512 * 7 * 7)
    sd["classifier.0.bias"] = _rand(4096)
    sd["classifier.3.weight"] = _rand(4096, 4096)
    sd["classifier.3.bias"] = _rand(4096)
    return sd


def _vgg16_trunk_t(x, sd):
    pools = {4, 9, 16, 23}  # after conv2_2, ... (torchvision layer indices)
    i = 0
    for idx in _VGG_IDX:
        x = F.relu(F.conv2d(x, sd[f"features.{idx}.weight"],
                            sd[f"features.{idx}.bias"], padding=1))
        i += 1
        if i in (2, 4, 7, 10):  # maxpool after blocks 1,2,3,4 (not 5)
            x = F.max_pool2d(x, 2, 2)
    return x


@pytest.mark.slow
def test_vgg16_conversion_parity(rng):
    sd = _vgg16_state_dict()
    converted = convert_vgg16({k: v.numpy() for k, v in sd.items()})

    model = VGG16()
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    params = dict(variables["params"])
    assert set(converted["trunk"].keys()) == set(params["trunk"].keys())
    params["trunk"] = converted["trunk"]
    params["tail"] = converted["tail"]

    got = np.asarray(jax.jit(lambda pp, xx: model.apply(
        pp, xx, method="extract_features"))({"params": params},
                                            jnp.asarray(x)))
    want = _vgg16_trunk_t(torch.from_numpy(x).permute(0, 3, 1, 2), sd)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # fc6/fc7 on a pooled 7x7x512 crop: torch flattens CHW, we flatten HWC —
    # the converter's column permutation must reconcile them exactly
    pooled = rng.randn(2, 7, 7, 512).astype(np.float32)
    got_fc = np.asarray(jax.jit(lambda pp, xx: model.apply(
        pp, xx, method="head_to_tail"))({"params": params},
                                        jnp.asarray(pooled)))
    t = torch.from_numpy(pooled).permute(0, 3, 1, 2).reshape(2, -1)
    t = F.relu(F.linear(t, sd["classifier.0.weight"], sd["classifier.0.bias"]))
    t = F.relu(F.linear(t, sd["classifier.3.weight"], sd["classifier.3.bias"]))
    np.testing.assert_allclose(got_fc, t.numpy(), rtol=1e-3, atol=1e-3)
