"""Spatial parallelism (sp): shard a single image's row axis over the mesh.

The reference's unit of parallelism never goes below one frame (SURVEY
§2j — io/work packets slice the *stream*). On TPU, very large frames
(4K/8K sources hitting min-side-800+ detectors) can exceed one chip's
activation working set at useful batch sizes; the TPU-native answer is to
shard H over the mesh and exchange conv halos over ICI — the same
NamedSharding/shard_map recipe as the frame-axis path, one level down.

Correctness contract: for a stack of SAME-padded convolutions whose total
receptive field is ≤ ``halo`` rows per side, halo exchange + crop
reproduces the unsharded output bit-for-bit —
  * interior shard boundaries see their true neighbor rows (ppermute), so
    cropped-interior outputs match the global conv exactly;
  * at the global top/bottom edges the halo rows lie *outside* the image.
    SAME padding zero-fills them at EVERY layer, not just the first, so
    ``fn`` receives a ``row_mask`` ([padded_rows] bool, True = inside the
    image) and must multiply each layer's input by it — that re-creates
    the layer-wise zero padding exactly. Interior shards get an all-True
    mask, so the multiply folds away there.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Jitted shard_map runners keyed on (fn, mesh, axis, row_axis, halo, ndim) —
# jit caches by function identity, so a fresh closure per call would
# retrace every invocation (ADVICE r3).
_RUNNER_CACHE: dict = {}


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str,
                       row_axis: int = 1) -> jnp.ndarray:
    """Pad my row-shard with ``halo`` rows from each mesh neighbor
    (zero-filled at the global top/bottom edges, i.e. SAME-conv padding).

    Inside shard_map; ``x``: ``[..., rows_local, ...]`` with the sharded
    row axis at ``row_axis``.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(arr, start, size):
        sl = [slice(None)] * arr.ndim
        sl[row_axis] = slice(start, start + size) if size > 0 else slice(0, 0)
        return arr[tuple(sl)]

    top_send = take(x, x.shape[row_axis] - halo, halo)  # my last rows -> below
    bot_send = take(x, 0, halo)                         # my first rows -> above
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i, i - 1) for i in range(1, n)]
    from_above = jax.lax.ppermute(top_send, axis_name, down)
    from_below = jax.lax.ppermute(bot_send, axis_name, up)
    # shard 0 has no predecessor, shard n-1 no successor: zero padding
    zero = jnp.zeros_like(from_above)
    from_above = jnp.where(idx == 0, zero, from_above)
    from_below = jnp.where(idx == n - 1, zero, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=row_axis)


def spatial_apply_traced(fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                         x: jnp.ndarray,
                         halo: int,
                         mesh: Mesh,
                         axis: str = "sp",
                         row_axis: int = 1) -> jnp.ndarray:
    """``spatial_apply`` for use INSIDE an enclosing jit trace (the
    executor's fused device segments): no jit/device_put of its own — the
    input is steered onto the row sharding with a sharding constraint and
    the shard_map composes into the outer program (GSPMD partitions it).

    ``fn(padded, row_gidx)`` receives the halo-padded local shard and the
    GLOBAL row index of every padded row (int32, <0 / >=rows outside the
    image — ``fn`` derives masks or border logic from it). It must return
    the same padded row count; the wrapper crops the halos. The output is
    still row-sharded; inside a fused segment it flows onward and XLA
    inserts any resharding the consumer needs.
    """
    n = int(mesh.shape[axis])
    rows = int(x.shape[row_axis])
    if rows % n != 0 or rows // n < halo:
        raise ValueError(
            f"rows={rows} must divide mesh axis {n} with local shard "
            f">= halo={halo}")
    spec = [None] * x.ndim
    spec[row_axis] = axis
    pspec = P(*spec)

    def body(xs):
        local = xs.shape[row_axis]
        padded = halo_exchange_rows(xs, halo, axis, row_axis=row_axis)
        idx = jax.lax.axis_index(axis)
        g = (idx * local + (jnp.arange(local + 2 * halo) - halo)) \
            .astype(jnp.int32)
        y = fn(padded, g)
        sl = [slice(None)] * y.ndim
        sl[row_axis] = slice(halo, y.shape[row_axis] - halo)
        return y[tuple(sl)]

    placed = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, pspec))
    out = shard_map(body, mesh=mesh, in_specs=(pspec,), out_specs=pspec,
                    check_rep=False)(placed)
    return out


def spatial_apply_pointwise(fn: Callable[[jnp.ndarray], jnp.ndarray],
                            x: jnp.ndarray,
                            mesh: Mesh,
                            axis: str = "sp",
                            row_axis: int = 1) -> jnp.ndarray:
    """Row-shard a row-POINTWISE op (halo 0): steer the input's row axis
    onto the 'sp' mesh with a sharding constraint, apply ``fn``, and
    constrain the output rows the same way — GSPMD partitions the
    (row-local) work over the reserved devices with no halo exchange.
    Exact for any ``fn`` whose output row i depends only on input row i
    (color conversions, per-pixel arithmetic, temporal stencils along
    other axes). Composes into the executor's fused segments like
    ``spatial_apply_traced``; callers fall back unsharded when rows don't
    divide the axis (``ctx.sp_mesh`` returns None)."""
    n = int(mesh.shape[axis])
    rows = int(x.shape[row_axis])
    if rows % n != 0:
        raise ValueError(f"rows={rows} must divide mesh axis {n}")
    spec = [None] * x.ndim
    spec[row_axis] = axis
    placed = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
    y = fn(placed)
    if y.ndim > row_axis and int(y.shape[row_axis]) == rows:
        out_spec = [None] * y.ndim
        out_spec[row_axis] = axis
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, P(*out_spec)))
    return y


def spatial_apply(fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                  x: jnp.ndarray,
                  halo: int,
                  mesh: Mesh,
                  axis: str = "data",
                  row_axis: int = 1) -> jnp.ndarray:
    """Run ``fn(padded, row_mask)`` (a SAME-padded conv stack, receptive
    field ≤ ``halo`` rows/side, row-count-preserving, multiplying each
    layer's input by ``row_mask`` — see module docstring) with ``x``'s row
    axis sharded over ``mesh[axis]``. Returns the full output, still
    row-sharded (a plain ``np.asarray``/``device_get`` gathers it).

    ``x.shape[row_axis]`` must divide by the mesh axis size and each local
    shard must be ≥ ``halo`` rows (one-hop neighbor exchange).
    """
    n = int(mesh.shape[axis])
    rows = int(x.shape[row_axis])
    if rows % n != 0 or rows // n < halo:
        raise ValueError(
            f"rows={rows} must divide mesh axis {n} with local shard "
            f">= halo={halo}")
    spec = [None] * x.ndim
    spec[row_axis] = axis
    pspec = P(*spec)
    key = (fn, mesh, axis, row_axis, halo, x.ndim)
    fn_sh = _RUNNER_CACHE.get(key)
    if fn_sh is None:

        def body(xs):
            local = xs.shape[row_axis]  # my shard's rows (static per trace)
            padded = halo_exchange_rows(xs, halo, axis, row_axis=row_axis)
            # global row index of each padded row; True = inside the image
            idx = jax.lax.axis_index(axis)
            g = idx * local + (jnp.arange(local + 2 * halo) - halo)
            row_mask = (g >= 0) & (g < local * n)
            y = fn(padded, row_mask)
            sl = [slice(None)] * y.ndim
            sl[row_axis] = slice(halo, y.shape[row_axis] - halo)
            return y[tuple(sl)]

        fn_sh = jax.jit(shard_map(body, mesh=mesh, in_specs=(pspec,),
                                  out_specs=pspec, check_rep=False))
        _RUNNER_CACHE[key] = fn_sh
    sharded = jax.device_put(jnp.asarray(x), NamedSharding(mesh, pspec))
    return fn_sh(sharded)
