"""Parallelism: device mesh + sharding helpers (SURVEY.md §2.7).

The reference has no multi-device support at all; this package is the
TPU-native replacement: a 1-D data mesh over ICI with NamedSharding — XLA
compiles the gradient all-reduce, no hand-written backend.
"""

from frcnn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    data_sharding,
    replicated_sharding,
)
