"""Expert parallelism (ep): a routed mixture-of-experts layer sharded
one-expert-group-per-chip over an ``expert`` mesh axis.

The reference has nothing like this (its nets are fixed per-frame CNNs,
SURVEY §2j); ep is a TPU-native addition for attaching modern
conditional-compute heads (e.g. a MoE classifier over face/pose
embeddings) to the zoo without replicating every expert's weights on
every chip.

TPU-native shape of the computation (the standard dispatch/combine
einsum formulation — all MXU work, no scatter/gather):
  * top-1 routing produces a one-hot dispatch mask [T, E];
  * tokens are dispatched to per-expert slots with a capacity bound C
    (static shapes: XLA cannot tile data-dependent expert loads), giving
    a dense [E, C, F] batch — each chip keeps only its own experts' rows;
  * each chip applies its local experts' FFN to its [E_local, C, F]
    slice (one batched matmul on the MXU);
  * combine is the transposed dispatch einsum followed by a ``psum``
    over the expert axis.

Tokens over capacity are DROPPED (router mask zeroes their combine
weight) — the standard static-shape MoE contract; callers size
``capacity_factor`` for their router balance.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Jitted shard_map runners keyed on (mesh, axis, capacity) — jit caches by
# function identity, so a fresh closure per call would retrace every
# invocation (ADVICE r3).
_RUNNER_CACHE: dict = {}


def init_moe_params(rng: jax.Array, n_experts: int, d_model: int,
                    d_hidden: int) -> Dict[str, jnp.ndarray]:
    """Router + E two-layer FFN experts, stacked on a leading expert axis."""
    k_r, k1, k2 = jax.random.split(rng, 3)
    he = jax.nn.initializers.he_normal()
    return {
        "router": he(k_r, (d_model, n_experts), jnp.float32),
        "w1": he(k1, (n_experts, d_model, d_hidden), jnp.float32),
        "w2": he(k2, (n_experts, d_hidden, d_model), jnp.float32),
    }


def _dispatch_mask(logits: jnp.ndarray, capacity: int):
    """Top-1 routing -> (combine [T, E, C], gate [T]) with a static
    per-expert capacity. Position within an expert's slot list is the
    token's rank among that expert's tokens (cumsum order); ranks >= C
    are dropped."""
    T, E = logits.shape
    expert = jnp.argmax(logits, axis=-1)                      # [T]
    gate = jax.nn.softmax(logits, axis=-1)[jnp.arange(T), expert]
    onehot = jax.nn.one_hot(expert, E, dtype=logits.dtype)    # [T, E]
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot         # rank in expert
    keep = (pos < capacity) & (onehot > 0)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                          dtype=logits.dtype)                 # [T, E, C]
    combine = slot * keep.astype(logits.dtype)[..., None] * gate[:, None, None]
    return combine


def _moe_body(axis: str, capacity: int):
    """Per-chip shard_map body shared by moe_apply and moe_apply_traced."""

    def body(p, xs):
        # p["w1"]/p["w2"] arrive [E/n, F, H]/[E/n, H, F]; router repl.
        idx = jax.lax.axis_index(axis)
        e_local = p["w1"].shape[0]
        logits = xs @ p["router"]                          # [T, E]
        combine = _dispatch_mask(logits, capacity)         # [T, E, C]
        # my experts' slice of the dispatch
        mine = jax.lax.dynamic_slice_in_dim(
            combine, idx * e_local, e_local, axis=1)       # [T, e, C]
        dispatched = jnp.einsum("tec,tf->ecf",
                                (mine > 0).astype(xs.dtype),
                                xs)                        # [e, C, F]
        h = jax.nn.relu(jnp.einsum("ecf,efh->ech", dispatched, p["w1"]))
        y = jnp.einsum("ech,ehf->ecf", h, p["w2"])         # [e, C, F]
        out = jnp.einsum("tec,ecf->tf", mine, y)           # partial
        return jax.lax.psum(out, axis)

    return body


def moe_apply_traced(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                     mesh: Mesh, axis: str = "expert",
                     capacity_factor: float = 2.0,
                     capacity: int = 0) -> jnp.ndarray:
    """``moe_apply`` for use INSIDE an enclosing jit trace (the executor's
    fused device segments): no jit/device_put of its own — expert-stacked
    weights are steered onto the ``axis`` sharding with constraints and the
    shard_map composes into the outer program (GSPMD partitions it).
    Identical routing/capacity/drop semantics to moe_apply/moe_reference.
    """
    E = int(params["w1"].shape[0])
    n = int(mesh.shape[axis])
    if E % n != 0:
        raise ValueError(f"n_experts={E} must divide mesh axis {n}")
    T = int(x.shape[0])
    if capacity <= 0:
        capacity = max(1, int(capacity_factor * T / E))
    pspec = {"router": P(), "w1": P(axis), "w2": P(axis)}
    placed = {k: jax.lax.with_sharding_constraint(
        jnp.asarray(v), NamedSharding(mesh, pspec[k]))
        for k, v in params.items()}
    fn = shard_map(_moe_body(axis, capacity), mesh=mesh,
                   in_specs=(pspec, P()), out_specs=P(), check_rep=False)
    return fn(placed, x)


def moe_apply(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
              mesh: Mesh, axis: str = "expert",
              capacity_factor: float = 2.0,
              capacity: int = 0) -> jnp.ndarray:
    """Expert-parallel top-1 MoE FFN: ``x`` [T, F] -> [T, F].

    ``params`` from ``init_moe_params``; expert-stacked weights shard
    ``P('expert')`` (each chip holds E/n experts), the router replicates.
    Routing/dispatch/combine run replicated per chip; only each chip's
    own experts' FFNs execute locally, and a single ``psum`` merges the
    combine partials.
    """
    E = int(params["w1"].shape[0])
    n = int(mesh.shape[axis])
    if E % n != 0:
        raise ValueError(f"n_experts={E} must divide mesh axis {n}")
    T = int(x.shape[0])
    if capacity <= 0:
        capacity = max(1, int(capacity_factor * T / E))

    pspec = {"router": P(), "w1": P(axis), "w2": P(axis)}
    key = (mesh, axis, capacity)
    fn = _RUNNER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(shard_map(_moe_body(axis, capacity), mesh=mesh,
                               in_specs=(pspec, P()),
                               out_specs=P(), check_rep=False))
        _RUNNER_CACHE[key] = fn
    placed = {k: jax.device_put(v, NamedSharding(mesh, pspec[k]))
              for k, v in params.items()}
    return fn(placed, jnp.asarray(x))


def moe_reference(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                  capacity_factor: float = 2.0,
                  capacity: int = 0) -> jnp.ndarray:
    """Unsharded golden with identical routing/capacity/drop semantics.

    ``capacity`` pins the per-expert slot count directly (callers wanting
    chunking-independent drop behavior derive it from a fixed reference
    batch instead of the per-chunk T — ADVICE r4)."""
    E = int(params["w1"].shape[0])
    T = int(x.shape[0])
    if capacity <= 0:
        capacity = max(1, int(capacity_factor * T / E))
    logits = x @ params["router"]
    combine = _dispatch_mask(logits, capacity)                 # [T, E, C]
    dispatched = jnp.einsum("tec,tf->ecf",
                            (combine > 0).astype(x.dtype), x)  # [E, C, F]
    h = jax.nn.relu(jnp.einsum("ecf,efh->ech", dispatched, params["w1"]))
    y = jnp.einsum("ech,ehf->ecf", h, params["w2"])
    return jnp.einsum("tec,ecf->tf", combine, y)
