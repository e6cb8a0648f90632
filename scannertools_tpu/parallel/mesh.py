"""Device-mesh utilities for multi-chip scaling.

Reference parity: the reference scales by data parallelism over stream
elements — ``pipeline_instances_per_node`` within a node and gRPC
master/worker across nodes (SURVEY §2j). There is no tensor/pipeline
parallelism in the reference; the scalable axis is frames × videos.

TPU-native design: a ``Mesh`` over chips with frames (the "data" axis)
sharded via NamedSharding; temporal stencil ops get their 1-frame halo from
a ``ppermute`` neighbor exchange instead of the engine's overlapping io
packets. Model-parallel axes exist for the NN ops' larger layers (tp) — XLA
inserts the collectives from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data", "model")) -> Mesh:
    """1- or 2-axis mesh. With 2 axes: model axis gets up to 2 chips, data
    the rest (frames are the scalable axis, mirroring the reference's
    data-parallel-only design)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axes) == 1:
        return Mesh(np.array(devs), axes)
    model = 2 if n % 2 == 0 and n >= 2 else 1
    data = n // model
    return Mesh(np.array(devs[: data * model]).reshape(data, model), axes)


def shard_frames(mesh: Mesh, frames, axis: str = "data"):
    """Place a [T, ...] chunk with the frame axis sharded over the mesh."""
    spec = P(axis, *([None] * (frames.ndim - 1)))
    return jax.device_put(frames, NamedSharding(mesh, spec))


def halo_exchange_1(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Append each shard's successor's first frame (1-frame forward halo).

    Inside shard_map over the frame axis: a temporal stencil op with
    stencil (0, 1) (e.g. optical flow pairs) needs frame i+1; at shard
    boundaries that frame lives on the next device. The last shard
    replicates its own final frame (stream-edge clamp, matching the
    executor's replicate padding).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my first frame to my left neighbor
    first = x[:1]
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(first, axis_name, perm)
    # shard n-1 has no successor: clamp to its own last frame
    tail = jnp.where(idx == n - 1, x[-1:], recv)
    return jnp.concatenate([x, tail], axis=0)
