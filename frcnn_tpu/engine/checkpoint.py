"""Checkpoint I/O helpers shared by the tools.

The snapshot format (SolverWrapper.snapshot): an orbax ``<prefix>_iter_N.ckpt``
directory holding {params, opt_state, step} + a ``.pkl`` sidecar with host
RNG/data-cursor state — the reference's .pth/.pkl pair (SURVEY.md §3.4).
"""

from __future__ import annotations

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np


def load_state(ckpt_path: str, abstract_state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(ckpt_path), abstract_state)


def load_params(ckpt_path: str, model, cfg):
    """Restore just the params tree from a snapshot .ckpt directory."""
    bh, bw = min(cfg.TPU.BUCKETS, key=lambda b: b[0] * b[1])
    images = jnp.zeros((1, bh, bw, 3), jnp.float32)
    im_info = jnp.asarray([[bh, bw, 1.0]], jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, im_info))
    abstract_params = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"])

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = osp.abspath(ckpt_path)
    try:
        state = ckptr.restore(path, {"params": abstract_params,
                                     "opt_state": None, "step": None})
        return state["params"]
    except Exception:
        # params-only checkpoint (e.g. exported weights)
        return ckptr.restore(path, abstract_params)


def save_params(ckpt_path: str, params):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(ckpt_path), jax.tree.map(np.asarray, params))
    ckptr.wait_until_finished()
