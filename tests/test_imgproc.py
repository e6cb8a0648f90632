"""Imgproc op tests (reference analogs: TestBlur/TestResize/TestMontage in
tests/test_all.py:180-193 and old/imgproc.py pipelines)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rand_frames():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(4, 33, 47, 3), dtype=np.uint8)


def _run_device(op_name, frames, **params):
    """Run a registered device op directly on a numpy chunk."""
    import jax

    from scannertools_tpu.registry import get_op

    fn = get_op(op_name).fn
    return np.asarray(jax.jit(
        lambda x: fn(None, x, **params)
    )(frames))


def test_resize(rand_frames):
    out = _run_device("Resize", rand_frames, width=24, height=16)
    assert out.shape == (4, 16, 24, 3) and out.dtype == np.uint8
    # preserve_aspect with width only (resize_kernel.cpp:46-53)
    out = _run_device("Resize", rand_frames, width=94, height=0,
                      preserve_aspect=True)
    assert out.shape == (4, 33 * 94 // 47, 94, 3)
    # min(): frame already smaller -> unchanged dims
    out = _run_device("Resize", rand_frames, width=100, height=100, min=True)
    assert out.shape == (4, 33, 47, 3)


def test_resize_matches_cv2_roughly(rand_frames):
    import cv2

    out = _run_device("Resize", rand_frames, width=24, height=16)
    want = np.stack([cv2.resize(f, (24, 16), interpolation=cv2.INTER_LINEAR)
                     for f in rand_frames])
    assert np.abs(out.astype(int) - want.astype(int)).mean() < 2.0


def test_blur_interior_matches_box_filter(rand_frames):
    k = 3
    out = _run_device("Blur", rand_frames, kernel_size=k)
    assert out.shape == rand_frames.shape and out.dtype == np.uint8
    # interior pixel: integer mean over the kxk window (blur_kernel_cpu.cpp:62-79)
    f = rand_frames[0].astype(np.uint32)
    y, x = 10, 20
    want = f[y - 1:y + 2, x - 1:x + 2].sum(axis=(0, 1)) // 9
    assert (out[0, y, x] == want).all()
    # borders keep original pixels
    assert (out[0, 0, 0] == rand_frames[0, 0, 0]).all()


def test_convert_color_gray(rand_frames):
    import cv2

    out = _run_device("ConvertColor", rand_frames,
                      conversion="COLOR_RGB2GRAY")
    want = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)
                     for f in rand_frames])[..., None]
    # cv2 5.0 uses a SIMD path whose rounding differs by <=1 LSB from the
    # documented fixed-point formula
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_convert_color_hsv_close(rand_frames):
    import cv2

    out = _run_device("ConvertColor", rand_frames, conversion="COLOR_RGB2HSV")
    want = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2HSV) for f in rand_frames])
    d = np.abs(out.astype(int) - want.astype(int))
    d[..., 0] = np.minimum(d[..., 0], 180 - d[..., 0])  # hue is circular
    # float-vs-fixed-point rounding: allow off-by-one
    assert d.max() <= 1


def test_brightness_contrast_sharpness(rand_frames):
    import cv2

    b = _run_device("Brightness", rand_frames)
    yuv = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV) for f in rand_frames])
    want_b = yuv[..., 0].mean(axis=(1, 2))
    assert np.abs(b[:, 0] - want_b).max() < 1.0

    c = _run_device("Contrast", rand_frames)
    inten = yuv[..., 0].astype(np.float64)
    want_c = np.sqrt(((inten - inten.mean(axis=(1, 2), keepdims=True)) ** 2)
                     .mean(axis=(1, 2)))
    assert np.abs(c[:, 0] - want_c).max() < 1.0

    s = _run_device("Sharpness", rand_frames)
    want_s = np.array([cv2.Laplacian(f, cv2.CV_64F).var() for f in rand_frames])
    assert np.abs(s / want_s - 1.0).max() < 0.05


def test_flow_histogram():
    rng = np.random.default_rng(3)
    flow = rng.normal(0, 10, size=(2, 16, 16, 2)).astype(np.float32)
    out = _run_device("FlowHistogram", flow)
    assert out.shape == (2, 2, 64)
    mag = np.sqrt((flow ** 2).sum(-1))
    in_range = (mag < 64).sum(axis=(1, 2))
    assert (out[:, 0].sum(axis=1) == in_range).all()


def test_frame_difference_pipeline(sc, ingested, video_frames):
    """Stencil (-1,0) across chunk boundaries must use real previous frames."""
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    sampled = sc.streams.Range(frame, [(0, 40)])
    diff = sc.ops.FrameDifference(frames=sampled)
    out = st.NamedStream(sc, "fdiff")
    # ingest="rgb": video_frames is the cv2 RGB decode; the I420 "auto"
    # ingest is +-2 LSB vs that (tests/test_yuv_ingest.py covers its
    # tolerance) and this test pins the stencil logic bit-exactly
    sc.run(sc.io.Output(diff, [out]),
           st.PerfParams.manual(work_packet_size=16, ingest="rgb"),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == 40
    # row 0 clamps to itself -> zeros
    assert got[0].sum() == 0
    # row 16 (first row of chunk 2) must diff against frame 15
    want = np.abs(video_frames[16].astype(np.int16)
                  - video_frames[15].astype(np.int16)).astype(np.uint8)
    assert (got[16] == want).all()


def test_montage_pipeline(sc, ingested):
    import scannertools_tpu as st

    n = 16
    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [list(range(0, 160, 10))])
    mont = sc.ops.Montage(frames=g, num_frames=n, target_width=48,
                          frames_per_row=4)
    out = st.NamedStream(sc, "montage")
    sc.run(sc.io.Output(mont, [out]),
           st.PerfParams.manual(work_packet_size=6),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == n
    th = 64 * 48 // 96
    assert got[-1].shape == (4 * th, 4 * 48, 3)  # the actual montage
    assert got[0].shape == (1, 1, 3)  # dummy


def test_draw_flow_and_bboxes():
    from scannertools_tpu.protobufs import BoundingBox
    from scannertools_tpu.registry import get_op

    frames = [np.zeros((20, 30, 3), np.uint8) for _ in range(2)]
    flows = [np.ones((20, 30, 2), np.float32) for _ in range(2)]
    out = get_op("DrawFlow").fn(None, frames, flows)
    assert out[0].shape == (20, 60, 3)

    boxes = [[BoundingBox(x1=0.1, y1=0.1, x2=0.5, y2=0.5)], []]
    out = get_op("DrawBboxes").fn(None, frames, boxes)
    assert out[0].sum() > 0 and out[1].sum() == 0
