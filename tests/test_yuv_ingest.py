"""I420 (YUV 4:2:0) ingest path — VERDICT r3 #1.

Device-bound frames travel as planar YUV (1.5 B/px, half the RGB24 uplink,
zero host swscale); the YUV->RGB conversion runs fused inside the device
segment (utils/framechunk.py:yuv420_to_rgb). Reference bar: the engine's
decode workers feed kernels without a host colorspace detour (SURVEY §1 L0).

Tolerance story: swscale's fixed-point unscaled converter and our float
conversion agree within 2 LSB (nearest-neighbor vs interpolating chroma
upsample accounts for most of it) — measured 0.39 mean abs diff on the
synthetic fixtures.
"""

import numpy as np
import pytest

import scannertools_tpu as st
from scannertools_tpu.io import av as st_av
from scannertools_tpu.utils.framechunk import FrameChunk

pytestmark = pytest.mark.skipif(
    not st_av.available(), reason="native libav decoder unavailable")


def _native_decoder(path):
    return st_av.NativeVideoDecoder(path)


def test_decoder_i420_matches_rgb(test_video):
    d_rgb = _native_decoder(test_video["path"])
    d_yuv = _native_decoder(test_video["path"])
    assert d_yuv.i420_supported  # mp4v writes yuv420p
    idx = list(range(0, 24, 3))
    rgb = d_rgb.read_frames(idx).astype(np.float32)
    planes = d_yuv.read_frames_i420(idx)
    assert planes.shape == (len(idx),
                            test_video["h"] * test_video["w"] * 3 // 2)
    chunk = FrameChunk.from_i420(planes, test_video["h"], test_video["w"],
                                 full_range=d_yuv.i420_full_range,
                                 bt709=d_yuv.i420_bt709)
    conv = chunk.hwc_u8().astype(np.float32)
    diff = np.abs(conv - rgb)
    assert diff.max() <= 4.0
    assert diff.mean() < 1.0
    d_rgb.close()
    d_yuv.close()


def test_framechunk_i420_device_matches_host(test_video):
    d = _native_decoder(test_video["path"])
    planes = d.read_frames_i420([0, 5, 11])
    d.close()
    chunk = FrameChunk.from_i420(planes, test_video["h"], test_video["w"])
    host = chunk.hwc_f32()
    dev = np.asarray(chunk.device().hwc_f32())
    assert np.abs(dev - host).max() <= 1.0  # fp assoc. differences only
    # u8 views agree with the f32 conversion
    assert (chunk.hwc_u8() == host.astype(np.uint8)).all()


def test_framechunk_payload_and_slice(test_video):
    d = _native_decoder(test_video["path"])
    planes = d.read_frames_i420(list(range(6)))
    d.close()
    h, w = test_video["h"], test_video["w"]
    chunk = FrameChunk.from_i420(planes, h, w)
    assert chunk.payload == h * w * 3 // 2
    assert chunk.fmt == "i420"
    sl = chunk.slice_rows(2, 3)
    assert sl.fmt == "i420" and len(sl) == 3
    want = chunk.hwc_u8()[2:5]
    assert (sl.hwc_u8() == want).all()


def test_e2e_histogram_yuv_vs_rgb(sc, test_video):
    """The canonical pipeline under both ingest formats: bin counts may
    shift only by the ±2 LSB decode difference near bin edges."""
    outs = {}
    for ingest in ("rgb", "i420"):
        video = st.NamedVideoStream(sc, f"yuvtest_{ingest}",
                                    path=test_video["path"])
        frame = sc.io.Input([video])
        g = sc.streams.Range(frame, [(0, 32)])
        hist = sc.ops.Histogram(frame=g)
        out = st.NamedStream(sc, f"yuvhist_{ingest}")
        sc.run(sc.io.Output(hist, [out]),
               st.PerfParams.manual(work_packet_size=16, ingest=ingest),
               cache_mode=st.CacheMode.Overwrite)
        outs[ingest] = np.stack([np.stack(x) for x in out.load()])
    a, b = outs["rgb"], outs["i420"]
    assert a.shape == b.shape == (32, 3, 16)
    # same total pixel count per frame/channel; tiny cross-bin migration
    assert (a.sum(axis=2) == b.sum(axis=2)).all()
    npix = test_video["h"] * test_video["w"]
    assert np.abs(a - b).max() <= 0.02 * npix


def test_e2e_frame_output_yuv_tolerance(sc, test_video, video_frames):
    """Sinking device-resized frames under i420 ingest stays within the
    decode tolerance of the RGB-ingest result."""
    outs = {}
    for ingest in ("rgb", "i420"):
        video = st.NamedVideoStream(sc, f"yuvrs_{ingest}",
                                    path=test_video["path"])
        frame = sc.io.Input([video])
        g = sc.streams.Range(frame, [(0, 8)])
        small = sc.ops.Resize(frame=g, width=48, height=32)
        out = st.NamedStream(sc, f"yuvrsout_{ingest}")
        sc.run(sc.io.Output(small, [out]),
               st.PerfParams.manual(work_packet_size=8, ingest=ingest),
               cache_mode=st.CacheMode.Overwrite)
        outs[ingest] = np.stack(list(out.load())).astype(np.float32)
    assert outs["rgb"].shape == outs["i420"].shape
    assert np.abs(outs["rgb"] - outs["i420"]).max() <= 4.0


def test_ingest_rgb_is_bit_exact(sc, test_video, video_frames):
    """ingest='rgb' keeps the bit-exact-with-cv2 contract."""
    from scannertools_tpu.ops.histogram import histogram_reference_np

    video = st.NamedVideoStream(sc, "yuvexact", path=test_video["path"])
    frame = sc.io.Input([video])
    g = sc.streams.Range(frame, [(0, 8)])
    hist = sc.ops.Histogram(frame=g)
    out = st.NamedStream(sc, "yuvexact_h")
    sc.run(sc.io.Output(hist, [out]),
           st.PerfParams.manual(work_packet_size=8, ingest="rgb"),
           cache_mode=st.CacheMode.Overwrite)
    got = np.stack([np.stack(x) for x in out.load()])
    assert (got == histogram_reference_np(video_frames[:8])).all()


def test_ingest_i420_required_but_unavailable(sc, test_video, monkeypatch):
    """PerfParams(ingest='i420') must fail loudly when the source cannot
    produce planes (cv2 fallback decoder)."""
    monkeypatch.setenv("SCANNERTOOLS_TPU_DECODER", "cv2")
    video = st.NamedVideoStream(sc, "yuvreq", path=test_video["path"])
    frame = sc.io.Input([video])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "yuvreq_h")
    with pytest.raises(ValueError, match="i420"):
        sc.run(sc.io.Output(hist, [out]),
               st.PerfParams.manual(work_packet_size=8, ingest="i420"),
               cache_mode=st.CacheMode.Overwrite)


def test_flow_f16_sink(sc, texture_video):
    """OpticalFlow(out_dtype='float16'): 4× smaller flow elements, loads
    still return H×W×2 f32 (reference contract tests/test_all.py:173-177),
    values within f16 quantization of the f32 run."""
    flows = {}
    for dt in ("float32", "float16"):
        video = st.NamedVideoStream(sc, f"f16v_{dt}",
                                    path=texture_video["path"])
        frame = sc.io.Input([video])
        g = sc.streams.Range(frame, [(0, 4)])
        flow = sc.ops.OpticalFlow(frames=g, out_dtype=dt)
        out = st.NamedStream(sc, f"f16flow_{dt}")
        sc.run(sc.io.Output(flow, [out]),
               st.PerfParams.manual(work_packet_size=4),
               cache_mode=st.CacheMode.Overwrite)
        elems = list(out.load())
        assert all(e.dtype == np.float32 for e in elems)  # load contract
        flows[dt] = np.stack(elems)
    h, w = texture_video["h"], texture_video["w"]
    assert flows["float32"].shape == (4, h, w, 2)
    # f16 has ~10 mantissa bits; flow magnitudes here are ~1 px
    assert np.abs(flows["float32"] - flows["float16"]).max() < 0.05
    # and the stored f16 stream really is ~half the bytes of the f32 one
    s32 = st.NamedStream(sc, "f16flow_float32")
    s16 = st.NamedStream(sc, "f16flow_float16")
    b32 = sum(len(b) for b in s32.load_bytes(range(4)))
    b16 = sum(len(b) for b in s16.load_bytes(range(4)))
    assert b16 < 0.6 * b32


def test_flow_f16_sink_auto_steering(sc, texture_video):
    """VERDICT r4 #5: store-raw-flow patterns get the float16 sink encoding
    BY DEFAULT (PerfParams.sink_dtype='auto' + OpDef.compact_sink) — the
    4× win is steered, not opt-in. Flow consumed by a downstream op keeps
    float32; explicit params and sink_dtype='float32' both disable."""
    import numpy as np

    h, w = texture_video["h"], texture_video["w"]

    def run_flow(name, perf=None, consumer=False, **flow_kw):
        video = st.NamedVideoStream(sc, f"steer_{name}",
                                    path=texture_video["path"])
        frame = sc.io.Input([video])
        g = sc.streams.Range(frame, [(0, 4)])
        flow = sc.ops.OpticalFlow(frames=g, **flow_kw)
        cols = flow
        if consumer:
            cols = [flow, sc.ops.FlowHistogram(flow=flow)]
        outs = st.NamedStream(sc, f"steerflow_{name}")
        sinks = [outs] if not consumer else [
            (outs, st.NamedStream(sc, f"steerfh_{name}"))]
        sc.run(sc.io.Output(cols, sinks),
               perf or st.PerfParams.manual(work_packet_size=4),
               cache_mode=st.CacheMode.Overwrite)
        elems = list(outs.load())
        assert all(e.dtype == np.float32 for e in elems)  # load contract
        return sum(len(b) for b in outs.load_bytes(range(4)))

    f16_bytes = 4 * (8 + h * w * 2 * 2)
    f32_bytes = 4 * (8 + h * w * 2 * 4)
    # sink-only consumer + default params -> steered to f16
    assert run_flow("auto") == f16_bytes
    # a downstream op consumer -> stays f32 (compute keeps full precision)
    assert run_flow("consumed", consumer=True) == f32_bytes
    # explicit op param wins over the steering
    assert run_flow("explicit", out_dtype="float32") == f32_bytes
    # PerfParams(sink_dtype="float32") disables it
    assert run_flow("off", perf=st.PerfParams.manual(
        work_packet_size=4, sink_dtype="float32")) == f32_bytes


def test_flow_serde_f16_roundtrip():
    from scannertools_tpu.types import get_type

    t = get_type("flow")
    a = (np.random.default_rng(0).standard_normal((6, 8, 2)) * 3).astype(
        np.float16)
    got = t.parse(t.serialize(a))
    assert got.dtype == np.float32
    assert np.allclose(got, a.astype(np.float32))
    a32 = a.astype(np.float32)
    got32 = t.parse(t.serialize(a32))
    assert got32.dtype == np.float32 and (got32 == a32).all()


def test_flow_sink_steering_reversible_on_same_graph(sc, texture_video):
    """A graph OBJECT re-run with sink_dtype='float32' sheds the param an
    earlier auto run injected (steered params are sentinel-tracked, never
    confused with user-passed ones)."""
    import numpy as np

    h, w = texture_video["h"], texture_video["w"]
    video = st.NamedVideoStream(sc, "rev_v", path=texture_video["path"])
    frame = sc.io.Input([video])
    g = sc.streams.Range(frame, [(0, 4)])
    flow = sc.ops.OpticalFlow(frames=g)
    out = st.NamedStream(sc, "rev_flow")

    def stored_bytes(perf):
        sc.run(sc.io.Output(flow, [out]), perf,
               cache_mode=st.CacheMode.Overwrite)
        return sum(len(b) for b in out.load_bytes(range(4)))

    f16 = 4 * (8 + h * w * 2 * 2)
    f32 = 4 * (8 + h * w * 2 * 4)
    assert stored_bytes(st.PerfParams.manual(work_packet_size=4)) == f16
    assert stored_bytes(st.PerfParams.manual(
        work_packet_size=4, sink_dtype="float32")) == f32
    assert stored_bytes(st.PerfParams.manual(work_packet_size=4)) == f16
