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
    """Restore just the params tree from a snapshot .ckpt directory (full
    SolverWrapper state or a params-only export)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(osp.abspath(ckpt_path))  # full tree, as saved
    if isinstance(state, dict) and "params" in state:
        return state["params"]
    return state


def save_params(ckpt_path: str, params):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(ckpt_path), jax.tree.map(np.asarray, params))
    ckptr.wait_until_finished()
