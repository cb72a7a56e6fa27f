"""torch → flax pretrained-weight conversion.

Rebuild of the reference's pretrained-backbone loading
(``lib/nets/{vgg16,resnet_v1}.py`` load ImageNet .pth files from
``data/imagenet_weights/`` — SURVEY.md §5.4).  torch (CPU) is installed in
this environment; torchvision is not, so we map raw ``state_dict`` names.

Conventions handled:
  * conv kernels: OIHW → HWIO transpose;
  * depthwise convs (mobilenet): OIHW (C,1,H,W) → HWIO (H,W,1,C);
  * linear kernels: (out, in) → (in, out) transpose; VGG fc6 additionally
    permutes its input columns CHW → HWC (we flatten pooled features HWC);
  * BatchNorm → FrozenBatchNorm {scale, bias, mean, var}.
"""

from __future__ import annotations

import numpy as np


def _t_conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _t_dense(w):
    return np.asarray(w).transpose(1, 0)


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }


def convert_resnet(state_dict, depth: int):
    """torchvision resnet{50,101,152} state_dict → our backbone params."""
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    trunk = {"conv1": {"kernel": _t_conv(state_dict["conv1.weight"])},
             "bn1": _bn(state_dict, "bn1")}
    tail = {}
    for li, n in enumerate(blocks, start=1):
        dest = trunk if li <= 3 else tail
        for bi in range(n):
            p = f"layer{li}.{bi}"
            block = {}
            for ci in (1, 2, 3):
                block[f"conv{ci}"] = {
                    "kernel": _t_conv(state_dict[f"{p}.conv{ci}.weight"])}
                block[f"bn{ci}"] = _bn(state_dict, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in state_dict:
                block["downsample_conv"] = {
                    "kernel": _t_conv(state_dict[f"{p}.downsample.0.weight"])}
                block["downsample_bn"] = _bn(state_dict, f"{p}.downsample.1")
            dest[f"layer{li}_block{bi}"] = block
    return {"trunk": trunk, "tail": tail}


# torchvision vgg16 features indices of the 13 convs, in order
_VGG_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_NAMES = ("conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
              "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
              "conv5_3")


def convert_vgg16(state_dict):
    trunk = {}
    for idx, name in zip(_VGG_IDX, _VGG_NAMES):
        trunk[name] = {
            "kernel": _t_conv(state_dict[f"features.{idx}.weight"]),
            "bias": np.asarray(state_dict[f"features.{idx}.bias"]),
        }
    # fc6: torch flattens (C=512, 7, 7); we flatten (7, 7, C)
    w6 = np.asarray(state_dict["classifier.0.weight"])  # (4096, 25088)
    w6 = w6.reshape(4096, 512, 7, 7).transpose(0, 2, 3, 1).reshape(4096, -1)
    tail = {
        "fc6": {"kernel": w6.transpose(1, 0),
                "bias": np.asarray(state_dict["classifier.0.bias"])},
        "fc7": {"kernel": _t_dense(state_dict["classifier.3.weight"]),
                "bias": np.asarray(state_dict["classifier.3.bias"])},
    }
    return {"trunk": trunk, "tail": tail}


def convert_detector(state_dict, net: str, num_anchors: int = 9):
    """Full reference-detector snapshot → complete FasterRCNN params tree.

    Converts the head weights the backbone converters skip (reference
    ``lib/nets/network.py`` modules, names as the lineage saves them):

      * ``rpn_net``        3x3x512 conv → HWIO;
      * ``rpn_cls_score``  1x1 conv, 2A channels.  The reference orders the
        2A channels bg-block-then-fg-block (c = j*A + a: its softmax reshapes
        (1, 2A, H, W) → (1, 2, A*H, W), ``network.py:~_reshape_layer``); we
        order per-anchor pairs (c = a*2 + j: one reshape to (K, 2)).  The
        output channels (and bias) are permuted accordingly;
      * ``rpn_bbox_pred``  1x1 conv, 4A channels — both sides agree on
        anchor-major (a, 4) order, no permutation;
      * ``cls_score`` / ``bbox_pred`` linears → transposed kernels.  The
        resnet tail mean-pools (no flatten), so no column permutation
        (VGG fc6 is the only flatten-order case, handled in convert_vgg16).
    """
    a = num_anchors
    if net == "vgg16":
        backbone = convert_vgg16(state_dict)
    elif net.startswith("res"):
        backbone = convert_resnet(state_dict, int(net[3:]))
    else:
        raise ValueError(f"no converter for backbone {net}")

    # reference fg/bg-block channel c = j*A + a → our per-anchor c = a*2 + j
    perm = np.array([j * a + i for i in range(a) for j in range(2)])
    cls_w = _t_conv(state_dict["rpn_cls_score.weight"])
    params = {
        "backbone": backbone,
        "rpn_net": {"kernel": _t_conv(state_dict["rpn_net.weight"]),
                    "bias": np.asarray(state_dict["rpn_net.bias"])},
        "rpn_cls_score": {
            "kernel": cls_w[..., perm],
            "bias": np.asarray(state_dict["rpn_cls_score.bias"])[perm]},
        "rpn_bbox_pred": {
            "kernel": _t_conv(state_dict["rpn_bbox_pred.weight"]),
            "bias": np.asarray(state_dict["rpn_bbox_pred.bias"])},
        "cls_score": {"kernel": _t_dense(state_dict["cls_score.weight"]),
                      "bias": np.asarray(state_dict["cls_score.bias"])},
        "bbox_pred": {"kernel": _t_dense(state_dict["bbox_pred.weight"]),
                      "bias": np.asarray(state_dict["bbox_pred.bias"])},
    }
    return params


def load_pretrained(path: str, net: str):
    """Load a torch .pth (or numpy .npz) backbone checkpoint → params subtree
    shaped for merging under 'backbone'."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=True))
        raise NotImplementedError(
            "npz backbone loading: provide a nested params pickle instead")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if net == "vgg16":
        backbone = convert_vgg16(sd)
    elif net.startswith("res"):
        backbone = convert_resnet(sd, int(net[3:]))
    else:
        raise ValueError(f"no converter for backbone {net}")
    return {"backbone": backbone}
