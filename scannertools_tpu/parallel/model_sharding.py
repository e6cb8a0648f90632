"""Tensor-parallel inference for the model zoo.

The reference has no model parallelism — its nets are small per-frame CNNs
scheduled data-parallel (SURVEY §2j). On TPU the large detectors
(Mask R-CNN X-101 at min-side-800, Faster-RCNN's 25k×4096 fc6) can exceed
one chip's comfortable working set at production batch sizes, and the
TPU-native answer is sharding annotations: place each parameter with a
``NamedSharding`` over the mesh's ``model`` axis and let GSPMD partition
the einsums and insert the collectives (the scaling-book recipe — no
hand-written collective calls).

``shard_params``'s generic rule covers conv/dense zoos without per-model
maps: shard the largest divisible axis of every weight tensor above a size
threshold (out-features of dense kernels, out-channels of convs —
column-parallel in Megatron terms), replicate everything small (biases,
norms). XLA then chooses all-gather/reduce-scatter placements globally,
which for inference graphs is within a few percent of hand-paired
row/column layouts and is robust to arbitrary architectures.

``tp_apply`` wraps a model's apply into a jit whose inputs are placed
(params sharded, activations replicated or batch-sharded over ``data``)
so the partitioner sees the intended layout.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(shape, n_model: int, min_size: int):
    """PartitionSpec sharding the largest divisible axis, or replicated."""
    if int(np.prod(shape)) < min_size or n_model <= 1:
        return P()
    # prefer trailing axes (out-features/channels): activations stay
    # batch-major, weight shards produce column-parallel partials
    for ax in reversed(range(len(shape))):
        if shape[ax] % n_model == 0 and shape[ax] >= n_model:
            spec = [None] * len(shape)
            spec[ax] = "model"
            return P(*spec)
    return P()


def shard_params(variables: Any, mesh: Mesh,
                 min_size: int = 1 << 16) -> Any:
    """device_put every leaf of a flax variable tree with a model-axis
    sharding chosen by `_spec_for` (leaves smaller than ``min_size``
    elements are replicated)."""
    n_model = int(mesh.shape.get("model", 1))

    def place(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        spec = _spec_for(arr.shape, n_model, min_size)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, variables)


def tp_apply(apply_fn: Callable, variables: Any, mesh: Mesh,
             data_parallel: bool = True) -> Callable:
    """-> jitted ``fn(x, *args)`` running ``apply_fn(variables, x, *args)``
    tensor-parallel over the mesh. ``variables`` must already be placed by
    ``shard_params``. Batch axis shards over ``data`` when requested (and
    divisible); everything else replicates."""
    jitted = jax.jit(apply_fn)
    n_data = int(mesh.shape.get("data", 1))

    def run(x, *args):
        x = jax.numpy.asarray(x)
        if data_parallel and n_data > 1 and x.shape[0] % n_data == 0:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:
            spec = P(*([None] * x.ndim))
        x = jax.device_put(x, NamedSharding(mesh, spec))
        with mesh:
            return jitted(variables, x, *args)

    return run


def tp_model(name: str, mesh: Optional[Mesh] = None,
             weights_path: Optional[str] = None,
             min_size: int = 1 << 16):
    """Convenience: fetch a registry model (ops/nn_generic) and return
    (sharded_variables, tp-jitted apply) over ``mesh`` (default: a mesh
    over all local devices with a maximal model axis)."""
    from ..ops.faces import _get_params
    from ..ops.nn_generic import get_model
    from .mesh import make_mesh

    if mesh is None:
        n = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()).reshape(1, n),
                    ("data", "model"))
    init_fn, apply_fn = get_model(name)
    variables = _get_params(f"nn:{name}", weights_path, init_fn)
    sharded = shard_params(variables, mesh, min_size=min_size)
    return sharded, tp_apply(apply_fn, sharded, mesh)
