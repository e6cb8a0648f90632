"""Pipeline-parallel (pp) inference over a ``pipe`` mesh axis.

The reference has no pipeline parallelism — its scalable axis is frames
(SURVEY §2j: ``pipeline_instances_per_node`` + master/worker). On TPU,
models whose stage chain exceeds one chip's working set (deep refinement
stacks like OpenPose's 6 stages, or big transformer heads attached to the
zoo) scale the TPU-native way: one *stage* per chip along a ``pipe`` mesh
axis, microbatches streaming through via ``ppermute`` — the GPipe schedule
expressed as a ``lax.scan`` so XLA sees one static program.

Design notes (why this shape):
  * The whole schedule is ONE jitted ``shard_map``: ``scan`` over
    M + S - 1 ticks, each tick = my stage's forward + one ``ppermute``
    hand-off. No per-tick dispatch, no host round-trips — ICI traffic is
    exactly one activation per tick per boundary.
  * Stage parameters are stacked on a leading stage axis and sharded
    ``P('pipe')`` so each device holds only its own stage's weights
    (that is the point of pp: the parameter working set divides by S).
  * Outputs materialize on the last stage; a single ``psum`` at the end
    broadcasts them (every other shard contributes zeros), keeping the
    output replicated like the executor's device segments expect.

Bubble fraction is (S-1)/(M+S-1), the GPipe bound — callers pick
microbatch counts M >> S for efficiency; correctness holds for any M >= 1.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage: list) -> Any:
    """Stack S per-stage pytrees (identical treedefs/shapes) along a new
    leading stage axis — the layout ``pipeline_apply`` shards over 'pipe'."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *per_stage)


# Jitted shard_map runners keyed on (stage_fn, mesh, axis, params treedef):
# jit caches by function identity, so a fresh closure per call would
# retrace every invocation (ADVICE r3) — fatal if pp runs per-chunk in the
# executor. jit itself still retraces per input shape under each key.
_RUNNER_CACHE: dict = {}


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any,
                   x: jnp.ndarray,
                   mesh: Mesh,
                   axis: str = "pipe") -> jnp.ndarray:
    """Run ``x`` through S chained stages, one stage per device.

    Args:
      stage_fn: ``(params_i, h) -> h`` — one stage's forward. Must preserve
        the hidden shape/dtype (uniform-width chain; project in/out inside
        the first/last stage).
      stacked_params: pytree whose leaves have leading axis S =
        ``mesh.shape[axis]`` (see ``stack_stage_params``).
      x: ``[M, B, ...]`` — M microbatches.
      mesh: mesh containing ``axis``.

    Returns ``[M, B, ...]`` outputs after all S stages, replicated.
    """
    S = int(mesh.shape[axis])
    for path, leaf in jax.tree_util.tree_flatten_with_path(stacked_params)[0]:
        if leaf.shape[0] != S:
            raise ValueError(
                f"stacked_params leaf {jax.tree_util.keystr(path)} has "
                f"leading (stage) axis {leaf.shape[0]} but mesh axis "
                f"'{axis}' has {S} devices — P('{axis}') would split it "
                f"k-per-device and silently apply only every k-th stage; "
                f"stack exactly S={S} stages (stack_stage_params)")

    treedef = jax.tree_util.tree_structure(stacked_params)
    key = (stage_fn, mesh, axis, treedef)
    fn = _RUNNER_CACHE.get(key)
    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    if fn is None:

        def body(params, xs):
            # params leaves arrive [1, ...] (my stage); xs [M, B, ...]
            M = xs.shape[0]
            my = jax.tree_util.tree_map(lambda p: p[0], params)
            idx = jax.lax.axis_index(axis)
            fwd = [(i, i + 1) for i in range(S - 1)]  # stage i -> i+1

            def tick(carry, t):
                buf, outs = carry
                # stage 0 consumes microbatch t (clamped during drain
                # ticks — drained garbage can never be recorded, see `m`)
                inp = jax.lax.dynamic_index_in_dim(
                    xs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
                cur = jnp.where(idx == 0, inp, buf)
                h = stage_fn(my, cur)
                # last stage finishes microbatch m = t-(S-1) at this tick
                m = t - (S - 1)
                rec = jnp.where((idx == S - 1) & (m >= 0), h,
                                jnp.zeros_like(h))
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, rec + jax.lax.dynamic_index_in_dim(
                        outs, jnp.clip(m, 0, M - 1), axis=0, keepdims=False),
                    jnp.clip(m, 0, M - 1), axis=0)
                # hand my activation to the next stage (stage 0 receives
                # nothing — absent sources yield zeros, overwritten by cur)
                buf = jax.lax.ppermute(h, axis, fwd) if S > 1 else buf
                return (buf, outs), None

            # shape/dtype probe — abstract only, no FLOPs
            h0 = jax.eval_shape(stage_fn, my,
                                jax.eval_shape(lambda a: a[0], xs))
            outs0 = jnp.zeros((M,) + tuple(h0.shape), h0.dtype)
            (_, outs), _ = jax.lax.scan(
                tick, (jnp.zeros(h0.shape, h0.dtype), outs0),
                jnp.arange(M + S - 1))
            # only the last stage wrote non-zeros; psum replicates
            return jax.lax.psum(outs, axis)

        fn = jax.jit(shard_map(body, mesh=mesh,
                               in_specs=(pspec, P()), out_specs=P(),
                               check_rep=False))
        _RUNNER_CACHE[key] = fn
    placed = jax.tree_util.tree_map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        stacked_params, pspec)
    return fn(placed, jnp.asarray(x))


def pipeline_apply_traced(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                          stacked_params: Any,
                          x: jnp.ndarray,
                          mesh: Mesh,
                          axis: str = "pipe") -> jnp.ndarray:
    """``pipeline_apply`` for use INSIDE an enclosing jit trace (the
    executor's fused device segments): no jit/device_put of its own —
    params are steered onto the pipe axis with a sharding constraint and
    the shard_map composes into the outer program (GSPMD partitions it).

    Same contract as ``pipeline_apply``; see that docstring.
    """
    S = int(mesh.shape[axis])
    for path, leaf in jax.tree_util.tree_flatten_with_path(stacked_params)[0]:
        if leaf.shape[0] != S:
            raise ValueError(
                f"stacked_params leaf {jax.tree_util.keystr(path)} has "
                f"leading (stage) axis {leaf.shape[0]} != mesh '{axis}' "
                f"size {S}")

    def body(params, xs):
        M = xs.shape[0]
        my = jax.tree_util.tree_map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        fwd = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            buf, outs = carry
            inp = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            cur = jnp.where(idx == 0, inp, buf)
            h = stage_fn(my, cur)
            m = t - (S - 1)
            rec = jnp.where((idx == S - 1) & (m >= 0), h, jnp.zeros_like(h))
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, rec + jax.lax.dynamic_index_in_dim(
                    outs, jnp.clip(m, 0, M - 1), axis=0, keepdims=False),
                jnp.clip(m, 0, M - 1), axis=0)
            buf = jax.lax.ppermute(h, axis, fwd) if S > 1 else buf
            return (buf, outs), None

        h0 = jax.eval_shape(stage_fn, my, jax.eval_shape(lambda a: a[0], xs))
        outs0 = jnp.zeros((M,) + tuple(h0.shape), h0.dtype)
        (_, outs), _ = jax.lax.scan(
            tick, (jnp.zeros(h0.shape, h0.dtype), outs0),
            jnp.arange(M + S - 1))
        return jax.lax.psum(outs, axis)

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    placed = jax.tree_util.tree_map(
        lambda leaf, sp: jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, sp)),
        stacked_params, pspec)
    fn = shard_map(body, mesh=mesh, in_specs=(pspec, P()), out_specs=P(),
                   check_rep=False)
    return fn(placed, x)


def sequential_reference(stage_fn, stacked_params, x):
    """Unsharded golden: fold every stage over every microbatch."""
    S = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    out = []
    for m in range(x.shape[0]):
        h = x[m]
        for i in range(S):
            my = jax.tree_util.tree_map(lambda p, i=i: p[i], stacked_params)
            h = stage_fn(my, h)
        out.append(h)
    return jnp.stack(out, axis=0)
