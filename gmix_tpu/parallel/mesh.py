"""Multi-device execution: data-parallel stream sharding over a jax Mesh.

The reference is single-threaded (SURVEY.md 2, parallelism inventory); the
TPU-native scaling axis is the stream dimension: every state array, the data
buffer, and the code buffer carry streams on axis 0, and the per-byte scan has
no cross-stream operations, so sharding axis 0 over a mesh makes the whole
codec embarrassingly data-parallel - XLA inserts zero collectives in the scan.
Collectives appear only at the edges: broadcast of pretrained weights
(replicate -> tile) and the ordered gather of per-stream outputs (device_get),
mirroring the reference's 5-byte-header framing (runner-utils.cpp:22-36).

Multi-host: the same mesh spans hosts via jax.distributed; per-host shards are
gathered in stream order by the container writer.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "streams") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def stream_sharding(mesh: Mesh, axis: str = "streams") -> NamedSharding:
    """Shard axis 0 (streams) of every array; scalars replicate."""
    return NamedSharding(mesh, P(axis))


def shard_state(state, mesh: Mesh, axis: str = "streams"):
    """Place a state pytree on the mesh: stream-major arrays sharded on axis 0,
    scalar leaves (LSTM epoch counters) replicated."""
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, state)


def broadcast_pretrained(single_stream_state, num_streams: int, mesh: Optional[Mesh] = None):
    """Tile a 1-stream checkpoint's state to S streams (the 'broadcast
    pretrained weights' path for block-parallel compression). Scalar leaves
    pass through."""
    import jax.numpy as jnp

    def tile(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == 1:
            return jnp.broadcast_to(x, (num_streams,) + x.shape[1:]).copy()
        return x

    out = jax.tree_util.tree_map(tile, single_stream_state)
    if mesh is not None:
        out = shard_state(out, mesh)
    return out
