#!/usr/bin/env python
"""Train a Faster R-CNN network (reference ``tools/trainval_net.py:~30-150``).

Example:
    python tools/trainval_net.py --net res50 --imdb voc_2007_trainval \
        --imdbval voc_2007_test --iters 70000 --cfg experiments/cfgs/res50.yml \
        --set ANCHOR_SCALES "[8,16,32]" TRAIN.IMS_PER_BATCH 2
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Train a Faster R-CNN network")
    parser.add_argument("--cfg", dest="cfg_file", default=None,
                        help="optional config yaml")
    parser.add_argument("--weight", dest="weight", default=None,
                        help="pretrained backbone weights (.pth or .msgpack)")
    parser.add_argument("--imdb", dest="imdb_name", default="voc_2007_trainval",
                        help="dataset to train on")
    parser.add_argument("--imdbval", dest="imdbval_name", default="voc_2007_test",
                        help="dataset to validate on")
    parser.add_argument("--iters", dest="max_iters", type=int, default=70000)
    parser.add_argument("--tag", dest="tag", default=None)
    parser.add_argument("--net", dest="net", default="res50",
                        choices=["vgg16", "res50", "res101", "res152", "mobile",
                                 "res50_fpn", "res101_fpn", "res152_fpn",
                                 "res50_fpn_gn", "res101_fpn_gn",
                                 "res152_fpn_gn"])
    parser.add_argument("--data-parallel", dest="data_parallel", type=int,
                        default=0, help="shard batches over N devices (0 = off)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None, help="config overrides: K V pairs")
    return parser.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from frcnn_tpu.config import (default_config, cfg_from_file, cfg_from_list,
                                  get_output_dir, get_output_tb_dir)
    from frcnn_tpu.engine.train import combined_roidb, train_net
    from frcnn_tpu.models import build_model
    import jax.numpy as jnp
    import numpy as np

    cfg = default_config()
    if args.cfg_file:
        cfg = cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    print("Using config:")
    print(cfg)

    np.random.seed(cfg.RNG_SEED)

    imdb, roidb = combined_roidb(args.imdb_name, cfg)
    print(f"{len(roidb)} roidb entries")
    output_dir = get_output_dir(cfg, args.imdb_name, args.tag)
    tb_dir = get_output_tb_dir(cfg, args.imdb_name, args.tag)
    print(f"Output will be saved to `{output_dir}`")

    valroidb = None
    if args.imdbval_name:
        _, valroidb = combined_roidb(args.imdbval_name, cfg)
        print(f"{len(valroidb)} validation roidb entries")

    dtype = jnp.bfloat16 if (cfg.TPU.DTYPE == "bfloat16"
                             and jax.default_backend() == "tpu") else jnp.float32
    model = build_model(args.net, imdb.num_classes, cfg, dtype=dtype)

    pretrained = None
    if args.weight:
        from frcnn_tpu.utils.weight_convert import load_pretrained

        pretrained = load_pretrained(args.weight, args.net)

    mesh = None
    if args.data_parallel:
        from frcnn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel)

    train_net(model, imdb, roidb, valroidb, output_dir, tb_dir, cfg=cfg,
              pretrained_params=pretrained, max_iters=args.max_iters, mesh=mesh)


if __name__ == "__main__":
    main()
