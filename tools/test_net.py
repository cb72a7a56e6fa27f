#!/usr/bin/env python
"""Test a Faster R-CNN network on an image database
(reference ``tools/test_net.py:~30-120``)."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Test a Faster R-CNN network")
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--model", dest="model_ckpt", required=True,
                        help="snapshot .ckpt directory (orbax)")
    parser.add_argument("--imdb", dest="imdb_name", default="voc_2007_test")
    parser.add_argument("--comp", dest="comp_mode", action="store_true")
    parser.add_argument("--num_dets", dest="max_per_image", type=int, default=100)
    parser.add_argument("--tag", dest="tag", default="")
    parser.add_argument("--net", dest="net", default="res50",
                        choices=["vgg16", "res50", "res101", "res152", "mobile",
                                 "res50_fpn", "res101_fpn", "res152_fpn",
                                 "res50_fpn_gn", "res101_fpn_gn",
                                 "res152_fpn_gn"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from frcnn_tpu.config import default_config, cfg_from_file, cfg_from_list, get_output_dir
    from frcnn_tpu.data.factory import get_imdb
    from frcnn_tpu.engine.test import test_net
    from frcnn_tpu.engine.checkpoint import load_params
    from frcnn_tpu.models import build_model

    cfg = default_config()
    if args.cfg_file:
        cfg = cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    print("Using config:")
    print(cfg)
    np.random.seed(cfg.RNG_SEED)

    imdb = get_imdb(args.imdb_name, data_dir=cfg.DATA_DIR)
    imdb.competition_mode(args.comp_mode)

    dtype = jnp.bfloat16 if (cfg.TPU.DTYPE == "bfloat16"
                             and jax.default_backend() == "tpu") else jnp.float32
    model = build_model(args.net, imdb.num_classes, cfg, dtype=dtype)
    params = load_params(args.model_ckpt, model, cfg)
    output_dir = get_output_dir(cfg, args.imdb_name, args.tag or "default")

    test_net(model, {"params": params}, imdb, cfg, output_dir,
             max_per_image=args.max_per_image, batch=args.batch)


if __name__ == "__main__":
    main()
