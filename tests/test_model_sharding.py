"""Tensor-parallel inference (parallel/model_sharding.py) on a virtual
8-device CPU mesh, run in a subprocess with the axon plugin scrubbed (the
same pattern as tests/test_parallel.py — the in-process backend here may be
pinned to a 1-chip TPU).
"""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os
import numpy as np
import jax
assert len(jax.devices()) >= 8, jax.devices()
import jax.numpy as jnp
from jax.sharding import Mesh
from scannertools_tpu.parallel.model_sharding import (
    _spec_for, shard_params, tp_apply)
from jax.sharding import PartitionSpec as P

# ---- spec rule
assert _spec_for((25088, 4096), 8, 1 << 16) == P(None, "model")
assert _spec_for((3, 3, 512, 512), 8, 1 << 16) == P(None, None, None, "model")
assert _spec_for((4096,), 8, 1 << 16) == P()          # small -> replicated
assert _spec_for((7, 13), 8, 1) == P()                # indivisible

# ---- facenet-style projection net: sharded == unsharded
import flax.linen as nn

class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        x = nn.relu(nn.Dense(512)(x))
        return nn.Dense(128)(x)

net = Net()
rng = jax.random.PRNGKey(0)
x = np.random.default_rng(1).normal(size=(8, 16, 16, 3)).astype(np.float32)
v = net.init(rng, jnp.asarray(x))
want = np.asarray(jax.jit(net.apply)(v, jnp.asarray(x)))

mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
sv = shard_params(v, mesh, min_size=1024)
# the big dense kernels must actually be distributed
flat = jax.tree_util.tree_leaves_with_path(sv)
sharded_leaves = [l for p, l in flat
                  if hasattr(l, "sharding") and
                  not l.sharding.is_fully_replicated]
assert sharded_leaves, "no parameter was sharded"
for l in sharded_leaves:
    assert len(l.addressable_shards) == 8
    shard_shape = l.addressable_shards[0].data.shape
    assert shard_shape != l.shape  # each device holds a proper slice

run = tp_apply(net.apply, sv, mesh)
got = np.asarray(run(x))
np.testing.assert_allclose(got, want, atol=2e-5)

# replicated fallback for an indivisible batch
got_odd = np.asarray(run(x[:5]))
np.testing.assert_allclose(got_odd, want[:5], atol=2e-5)

# ---- a registry model end-to-end (gender net is the smallest)
from scannertools_tpu.parallel.model_sharding import tp_model
sv2, run2 = tp_model("gender_levi_hassner", mesh=mesh, min_size=1 << 12)
frames = np.random.default_rng(2).normal(
    size=(8, 227, 227, 3)).astype(np.float32)
out = np.asarray(run2(frames))
assert out.shape[0] == 8
print("MODEL_SHARDING_OK")
"""


def test_tensor_parallel_inference_8dev():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if "axon" not in p
    ) or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in env["PYTHONPATH"]:
        env["PYTHONPATH"] = root + os.pathsep + env["PYTHONPATH"]
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    res = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, timeout=1200)
    if "is not in the list of known backends" in res.stderr or \
            "NO_VIRTUAL_MESH" in res.stdout:
        pytest.skip("virtual CPU mesh unavailable")
    assert res.returncode == 0, res.stderr[-3000:]
    assert "MODEL_SHARDING_OK" in res.stdout
