"""Device mesh + sharding utilities.

The workload's parallelism (SURVEY.md §2.7): pure data parallelism over a
1-D ``data`` mesh axis across TPU chips (ICI).  Params are replicated;
batches are sharded on axis 0; under jit the replicated-param gradient
reduction compiles to an ICI psum — no explicit collectives in user code.

The mesh API is deliberately N-D-ready (axis_names tuple) so a ``model``
axis could be added without restructuring, but only ``data`` is built (the
reference's models are far below chip HBM).

Works identically on real TPUs and on CPU with
``--xla_force_host_platform_device_count=N`` (how tests and the driver's
``dryrun_multichip`` validate multi-chip behavior without hardware).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put every array in the batch pytree with batch-axis sharding.

    Batch size must divide the mesh size; the loader guarantees it.
    """
    s = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
