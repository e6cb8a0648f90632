"""Multi-chip dry-run: jit a full training step over an n-device mesh.

Used by the driver's ``dryrun_multichip`` hook (and by tests on a virtual
8-device CPU mesh) to validate that the framework's sharding layout compiles
and executes: data-parallel frames, tensor-parallel wide layers, collectives
inserted by XLA from NamedSharding annotations.

The model is a miniature of the framework's embedding stack (conv backbone →
pooled features → projection head, the FaceNet-style shape): convs run
data-parallel; the projection head's weight is sharded over the ``model``
axis (real tp — XLA inserts the all-reduce); the loss all-reduces over
``data`` (dp gradient sync).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def init_params(rng: jax.Array, c_in: int = 3, width: int = 64,
                embed: int = 128) -> Dict[str, jnp.ndarray]:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    he = jax.nn.initializers.he_normal()
    return {
        "conv1": he(k1, (3, 3, c_in, width), jnp.float32),
        "conv2": he(k2, (3, 3, width, width), jnp.float32),
        "proj": he(k3, (width, embed), jnp.float32),
        "cls": he(k4, (embed, 32), jnp.float32),
    }


def forward(params: Dict[str, jnp.ndarray], frames: jnp.ndarray) -> jnp.ndarray:
    """frames: [B, H, W, 3] float -> [B, 32] logits. bfloat16 on the MXU."""
    x = frames.astype(jnp.bfloat16) / 255.0
    for name in ("conv1", "conv2"):
        x = jax.lax.conv_general_dilated(
            x, params[name].astype(jnp.bfloat16),
            window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
    feats = jnp.mean(x, axis=(1, 2))  # [B, width]
    emb = feats.astype(jnp.float32) @ params["proj"]  # tp-sharded matmul
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)
    return emb @ params["cls"]


def loss_fn(params, frames, labels):
    logits = forward(params, frames)
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def train_step(params, frames, labels, lr: float = 1e-2):
    loss, grads = jax.value_and_grad(loss_fn)(params, frames, labels)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def param_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """convs replicated (dp); projection/cls sharded over 'model' (tp)."""
    return {
        "conv1": NamedSharding(mesh, P(None, None, None, None)),
        "conv2": NamedSharding(mesh, P(None, None, None, None)),
        "proj": NamedSharding(mesh, P(None, "model")),
        "cls": NamedSharding(mesh, P("model", None)),
    }


def run_dryrun(n_devices: int, batch: int = 16, hw: int = 32) -> float:
    """One sharded training step on tiny shapes; returns the loss."""
    mesh = make_mesh(n_devices)
    rng = jax.random.PRNGKey(0)
    params = init_params(rng)
    p_shard = param_shardings(mesh)
    data_spec = NamedSharding(mesh, P("data"))

    params = {k: jax.device_put(v, p_shard[k]) for k, v in params.items()}
    frames = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (batch, hw, hw, 3))
        .astype(np.float32),
        data_spec,
    )
    labels = jax.device_put(
        np.random.default_rng(1).integers(0, 32, (batch,)), data_spec
    )

    step = jax.jit(
        train_step,
        in_shardings=(p_shard, data_spec, data_spec),
        out_shardings=({k: p_shard[k] for k in params}, None),
    )
    with mesh:
        new_params, loss = step(params, frames, labels)
        jax.block_until_ready(loss)
    return float(loss)
