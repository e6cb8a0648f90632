"""Histogram op: exact parity with the cv::calcHist golden model
(reference TestHistogram, tests/test_all.py:150-159)."""

import numpy as np


def test_histogram_op_numeric():
    import jax.numpy as jnp

    from scannertools_tpu.ops.histogram import (_histogram_jnp,
                                                histogram_reference_np)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 17, 23, 3), dtype=np.uint8)
    got = np.asarray(_histogram_jnp(jnp.asarray(frames)))
    want = histogram_reference_np(frames)
    assert got.shape == (3, 3, 16)
    assert (got == want).all()
    # each histogram sums to the pixel count
    assert (got.sum(axis=2) == 17 * 23).all()


def test_histogram_pipeline(sc, ingested, video_frames):
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "test1_hist")
    sc.run(sc.io.Output(hist, [out]),
           st.PerfParams.manual(work_packet_size=32),
           cache_mode=st.CacheMode.Overwrite)

    assert out.committed()
    assert len(out) == len(ingested)
    got = list(out.load())
    # load() parses as 3 arrays of 16 int32 (reference types.py:23-27)
    assert len(got[0]) == 3 and got[0][0].dtype == np.int32
    want = histogram_reference_np(video_frames)
    for i in (0, 1, 100, 239):
        assert (np.stack(got[i]) == want[i]).all(), f"frame {i}"


def test_histogram_with_gather(sc, ingested, video_frames):
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    idx = [0, 10, 33, 239]
    frame = sc.io.Input([ingested])
    sampled = sc.streams.Gather(frame, [idx])
    hist = sc.ops.Histogram(frame=sampled)
    out = st.NamedStream(sc, "hist_gather")
    sc.run(sc.io.Output(hist, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == len(idx)
    want = histogram_reference_np(video_frames[idx])
    for k in range(len(idx)):
        assert (np.stack(got[k]) == want[k]).all()


def test_cache_modes(sc, ingested):
    import pytest

    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "hist_cache")
    o = sc.io.Output(hist, [out])
    pp = st.PerfParams.manual(work_packet_size=64)
    sc.run(o, pp, cache_mode=st.CacheMode.Overwrite)
    with pytest.raises(RuntimeError):
        sc.run(o, pp, cache_mode=st.CacheMode.Error)
    sc.run(o, pp, cache_mode=st.CacheMode.Ignore)  # skips silently


def test_histogram_pallas_interpret_parity():
    """Bit-validate the pallas packed-counter kernel through the pallas
    interpreter on the CPU backend — the only honest check available where
    Mosaic cannot run (the axon relay). Covers a sub-tile geometry with
    tail-byte masking (npix % 128 != 0) and a multi-tile geometry with a
    ragged last row-tile (rows % _TILE != 0). Runs in a subprocess with the
    axon plugin scrubbed (its sitecustomize pins the tunneled TPU)."""
    import os
    import subprocess
    import sys

    import pytest

    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.jax_cache"))
    code = """
import numpy as np
from scannertools_tpu.ops.histogram import (_histogram_pallas, _TILE,
                                            histogram_reference_np)
from scannertools_tpu.utils.framechunk import FrameChunk

rng = np.random.default_rng(0)
for shape in [(3, 33, 17, 3), (2, 120, 128, 3)]:
    fr = rng.integers(0, 256, shape, np.uint8)
    chunk = FrameChunk.from_hwc(fr)
    rows = chunk.flat.shape[1]
    got = np.asarray(_histogram_pallas(chunk, interpret=True))
    assert (got == histogram_reference_np(fr)).all(), (shape, rows)
# assert the two geometries actually exercised both raggedness modes
assert (33 * 17 * 3) % 128 != 0
assert (120 * 128 * 3 // 128) > _TILE and (120 * 128 * 3 // 128) % _TILE != 0
print('PALLAS_INTERPRET_OK')
"""
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        pytest.skip("interpret-mode subprocess timed out (loaded sandbox)")
    assert res.returncode == 0 and "PALLAS_INTERPRET_OK" in res.stdout, (
        res.stdout + res.stderr)


def test_histogram_pallas_sharded_one_device_mesh():
    """shard_map'd pallas kernel on a 1-device mesh (multi-device meshes
    need real chips; per-frame independence makes N-way correctness follow)."""
    import jax
    import pytest

    from scannertools_tpu.ops.histogram import (_histogram_pallas_sharded,
                                                _pallas_available,
                                                histogram_reference_np)
    from scannertools_tpu.parallel.sharded import data_mesh
    from scannertools_tpu.utils.framechunk import FrameChunk

    if not _pallas_available():
        pytest.skip("no TPU pallas backend")
    fr = np.random.default_rng(0).integers(0, 256, (5, 32, 48, 3), np.uint8)
    chunk = FrameChunk.from_hwc(fr).device()
    mesh = data_mesh(1)
    out = np.asarray(jax.jit(
        lambda c: _histogram_pallas_sharded(c, mesh))(chunk))
    assert (out == histogram_reference_np(fr)).all()
