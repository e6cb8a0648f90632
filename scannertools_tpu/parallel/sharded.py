"""Multi-chip execution: shard the frame axis of chunk programs over a mesh.

Reference parity: ``pipeline_instances_per_node`` replicated the op pipeline
across GPUs of a node and gRPC master/worker spread work across nodes
(SURVEY §2j; scannertools_infra/tests.py:17-33). TPU-native design:

  * Intra-host ("instances" analog): ONE jitted chunk program whose frame
    axis is sharded over the chip mesh with NamedSharding — XLA partitions
    every op and inserts collective-permutes for the temporal-stencil
    slices (flow's frame i+1 at a shard edge rides the ICI), so the same
    traced code runs 1-chip or N-chip. No per-chip replication machinery.
  * Inter-host: jobs (videos / frame ranges) statically partition across
    hosts by ``jax.process_index()`` (see ``host_job_slice``) — the
    master/worker control plane collapses into deterministic ownership,
    with storage (named streams) as the only shared state, mirroring the
    reference's storage-only data plane.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=4)
def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def frame_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (frames), replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def pad_frames_to(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def pad_rows_to_multiple(x, multiple: int):
    """Pad axis 0 of every leaf (array or FrameChunk pytree) up to a multiple
    of ``multiple`` by replicating the last row. device_put with NamedSharding
    rejects non-divisible dims; executor slicing is front-anchored, so the
    replicated tail is never read."""
    import jax.numpy as jnp

    def pad(leaf):
        n = leaf.shape[0]
        extra = pad_frames_to(n, multiple) - n
        if extra == 0:
            return leaf
        xp = np if isinstance(leaf, np.ndarray) else jnp
        return xp.concatenate(
            [leaf, xp.repeat(leaf[-1:], extra, axis=0)], axis=0)

    return jax.tree_util.tree_map(pad, x)


def shard_value(mesh: Mesh, x):
    """device_put a chunk array / FrameChunk pytree with frames sharded.
    Frame counts must already be padded to a multiple of the mesh size
    (see pad_rows_to_multiple)."""
    def put(leaf):
        return jax.device_put(leaf, frame_sharding(mesh, leaf.ndim))

    return jax.tree_util.tree_map(put, x)


def host_job_slice(n_jobs: int, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> range:
    """The contiguous job slice owned by this host (inter-host data
    parallelism; replaces the reference's master/worker dispatch)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_jobs // pc)
    return range(min(pi * per, n_jobs), min((pi + 1) * per, n_jobs))
