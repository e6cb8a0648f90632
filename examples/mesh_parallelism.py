"""The framework's five mesh-parallel axes on one machine.

Runs tiny demonstrations of each sharding mechanism over however many
devices are visible (use a virtual CPU mesh to try 8 without hardware):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/mesh_parallelism.py

  dp — frame-axis data parallelism (the executor's production path;
       here shown standalone via NamedSharding)
  tp — tensor parallelism: zoo model weights column-sharded, GSPMD
       inserts the collectives (parallel/model_sharding.py)
  pp — pipeline parallelism: stage-per-chip GPipe schedule
       (parallel/pipeline_parallel.py)
  sp — spatial parallelism: one image's rows sharded with ICI halo
       exchange (parallel/spatial.py)
  ep — expert parallelism: top-1 MoE, experts sharded per chip
       (parallel/expert.py)

The reference scales only over stream elements (SURVEY §2j); the other
axes are TPU-native additions — every one is annotation/shard_map +
XLA collectives, no hand-written communication.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main() -> None:
    devs = jax.devices()
    n = len(devs)
    print(f"{n} device(s): {devs[0].platform}")
    rng = np.random.default_rng(0)

    # dp: frame axis sharded over the mesh
    from scannertools_tpu.ops.histogram import _histogram_jnp
    mesh = Mesh(np.array(devs), ("data",))
    frames = jnp.asarray(rng.integers(0, 255, (n * 4, 64, 96, 3), np.uint8))
    sharded = jax.device_put(
        frames, NamedSharding(mesh, P("data", None, None, None)))
    hists = jax.jit(_histogram_jnp)(sharded)
    print(f"dp: histogram over {frames.shape[0]} frames, "
          f"{len(hists.addressable_shards)} shard(s)")

    # tp: generic column-parallel zoo inference
    from scannertools_tpu.parallel.model_sharding import tp_model
    mesh2 = Mesh(np.array(devs).reshape(1, n), ("data", "model"))
    _, run = tp_model("gender_levi_hassner", mesh=mesh2, min_size=1 << 12)
    out = run(rng.normal(size=(4, 227, 227, 3)).astype(np.float32))
    print(f"tp: gender net over a {n}-way model axis -> {out.shape}")

    # pp: stage-per-chip pipeline
    from scannertools_tpu.parallel.pipeline_parallel import (
        pipeline_apply, stack_stage_params)
    F = 16
    stages = stack_stage_params([
        {"w": jnp.asarray(rng.normal(size=(F, F), scale=0.3), jnp.float32)}
        for _ in range(n)])
    x = jnp.asarray(rng.normal(size=(4 * n, 2, F)), jnp.float32)
    y = pipeline_apply(lambda p, h: jnp.tanh(h @ p["w"]), stages, x,
                       Mesh(np.array(devs), ("pipe",)))
    print(f"pp: {n} stages x {x.shape[0]} microbatches -> {y.shape}")

    # sp: rows of one image sharded, conv halo over ICI
    from scannertools_tpu.parallel.spatial import spatial_apply
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8), scale=0.2), jnp.float32)

    def conv(img, row_mask=None):
        if row_mask is not None:
            img = img * row_mask[None, :, None, None]
        return jax.lax.conv_general_dilated(
            img, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    img = jnp.asarray(rng.normal(size=(1, 8 * n, 128, 3)), jnp.float32)
    ys = spatial_apply(conv, img, halo=1, mesh=mesh)
    print(f"sp: {img.shape[1]} rows over {n} chip(s) -> {ys.shape}")

    # ep: experts sharded per chip
    from scannertools_tpu.parallel.expert import init_moe_params, moe_apply
    mp = init_moe_params(jax.random.PRNGKey(1), n, F, 2 * F)
    tokens = jnp.asarray(rng.normal(size=(8 * n, F)), jnp.float32)
    ye = moe_apply(mp, tokens, Mesh(np.array(devs), ("expert",)))
    print(f"ep: {n} expert(s), {tokens.shape[0]} tokens -> {ye.shape}")


if __name__ == "__main__":
    main()
