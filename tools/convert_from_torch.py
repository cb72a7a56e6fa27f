#!/usr/bin/env python
"""Convert torch checkpoints to this framework's format
(reference ``tools/convert_from_depre.py:~1-200`` — the old-snapshot
converter; ours converts torch ImageNet backbones or full reference
detector snapshots into orbax params checkpoints).

Usage:
    # ImageNet backbone (torchvision state_dict .pth):
    python tools/convert_from_torch.py --net res101 \
        --torch data/imagenet_weights/res101.pth --out data/jax_weights/res101

    # writes an orbax checkpoint holding a params subtree that
    # tools/trainval_net.py --weight can load.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", required=True,
                        choices=["vgg16", "res50", "res101", "res152"])
    parser.add_argument("--torch", dest="torch_path", required=True)
    parser.add_argument("--out", dest="out_path", required=True)
    args = parser.parse_args()

    from frcnn_tpu.engine.checkpoint import save_params
    from frcnn_tpu.utils.weight_convert import load_pretrained

    params = load_pretrained(args.torch_path, args.net)
    save_params(args.out_path, params)
    n = sum(1 for _ in _leaves(params))
    print(f"Converted {n} tensors from {args.torch_path} -> {args.out_path}")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
