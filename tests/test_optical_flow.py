"""Farnebäck optical flow (reference TestOpticalFlow, tests/test_all.py:162-177:
asserts 50 rows of H×W×2 f32 after Range(0,50))."""

import numpy as np
import pytest


def _make_pair(shift, hw=(96, 128), seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    base = cv2.GaussianBlur(
        rng.integers(0, 256, hw, np.uint8).astype(np.float32), (0, 0), 3.0
    )
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    moved = np.clip(cv2.warpAffine(base, M, hw[::-1]), 0, 255)
    return base, moved


def test_flow_recovers_translation():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.ops.optical_flow import farneback_pairs

    g0, g1 = _make_pair((2.3, -1.7))
    flow = np.asarray(jax.jit(farneback_pairs)(
        jnp.asarray(g0[None]), jnp.asarray(g1[None])
    ))[0]
    inner = flow[24:-24, 24:-24]
    err = np.linalg.norm(inner - np.array([2.3, -1.7]), axis=-1)
    assert np.median(err) < 0.15, np.median(err)


@pytest.mark.slow
def test_flow_close_to_opencv():
    import cv2
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.ops.optical_flow import farneback_pairs

    g0, g1 = _make_pair((1.0, 0.5), seed=3)
    want = cv2.calcOpticalFlowFarneback(
        g0.astype(np.uint8), g1.astype(np.uint8), None,
        0.5, 3, 15, 3, 5, 1.2, 0
    )
    got = np.asarray(jax.jit(farneback_pairs)(
        jnp.asarray(g0[None]), jnp.asarray(g1[None])
    ))[0]
    d = np.abs(got[24:-24, 24:-24] - want[24:-24, 24:-24])
    assert np.median(d) < 0.5, np.median(d)


@pytest.mark.slow
def test_flow_pipeline(sc, texture_video):
    """Output spec: H x W x 2 f32, one row per sampled frame
    (tests/test_all.py:171-177); values recover the known 1 px/frame pan."""
    import scannertools_tpu as st

    n = 12
    video = st.NamedVideoStream(sc, "tex", path=texture_video["path"])
    frame = sc.io.Input([video])
    ranged = sc.streams.Range(frame, [(0, n)])
    flow = sc.ops.OpticalFlow(frames=ranged)
    out = st.NamedStream(sc, "flow")
    sc.run(sc.io.Output(flow, [out]),
           st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == n
    h, w = texture_video["h"], texture_video["w"]
    assert got[0].shape == (h, w, 2) and got[0].dtype == np.float32
    # camera pans +1 px/frame: content shifts by -1 px in x between frames
    f5 = got[5]
    inner = f5[16:-16, 16:-16]
    assert abs(np.median(np.abs(inner[..., 0])) - 1.0) < 0.3, \
        np.median(inner[..., 0])
    assert np.abs(np.median(inner[..., 1])) < 0.3


@pytest.mark.slow
def test_shift_warp_matches_gather_and_recovers_large_motion():
    """The default shift-warp (warp_px=16) tracks the exact gather warp's
    results on the goldens, and recovers a 10-px translation (motion well
    past the per-iteration increment but inside the warp bound)."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.ops.optical_flow import farneback_pairs

    g0, g1 = _make_pair((2.3, -1.7))
    fast = np.asarray(jax.jit(farneback_pairs)(
        jnp.asarray(g0[None]), jnp.asarray(g1[None])))[0]
    exact = np.asarray(jax.jit(
        lambda a, b: farneback_pairs(a, b, warp_px=0))(
        jnp.asarray(g0[None]), jnp.asarray(g1[None])))[0]
    d = np.abs(fast[24:-24, 24:-24] - exact[24:-24, 24:-24])
    assert np.median(d) < 0.05, np.median(d)

    g0, g1 = _make_pair((10.4, -6.2), hw=(240, 320), seed=7)
    flow = np.asarray(jax.jit(farneback_pairs)(
        jnp.asarray(g0[None]), jnp.asarray(g1[None])))[0]
    err = np.linalg.norm(flow[40:-40, 40:-40] - np.array([10.4, -6.2]),
                         axis=-1)
    assert np.median(err) < 0.2, np.median(err)
