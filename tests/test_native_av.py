"""Native libav decoder (st_av.cpp) — parity vs the cv2 backend and
compressed-audio decode.

Reference parity: the engine's ffmpeg decode worker (SURVEY §1 L0) and the
any-codec Audio source (audio_source.cpp:31-412). The cv2 backend is the
independent cross-check: both wrap ffmpeg ultimately, but through entirely
different APIs (VideoCapture vs libavformat/libavcodec directly), so
agreement is meaningful.
"""

import numpy as np
import pytest

from scannertools_tpu.io import av


pytestmark = pytest.mark.skipif(
    not av.available(), reason="st_av native module failed to build")


def _cv2_frames(path, idxs):
    from scannertools_tpu.io.video import Cv2VideoDecoder

    d = Cv2VideoDecoder(path)
    try:
        return d.read_frames(idxs)
    finally:
        d.close()


def test_meta_matches_cv2(test_video):
    from scannertools_tpu.io.video import Cv2VideoDecoder

    nd = av.NativeVideoDecoder(test_video["path"])
    cd = Cv2VideoDecoder(test_video["path"])
    assert nd.meta.num_frames == cd.meta.num_frames == test_video["n"]
    assert (nd.meta.width, nd.meta.height) == (cd.meta.width, cd.meta.height)
    assert abs(nd.meta.fps - cd.meta.fps) < 0.01
    nd.close()
    cd.close()


@pytest.mark.parametrize("pattern", [
    list(range(0, 16)),            # sequential from 0
    [5, 6, 7, 100, 101, 200],      # seek runs
    [0, 239],                      # first + last
    list(range(100, 240, 10)),     # strided (gap < seek threshold)
])
def test_frames_match_cv2(test_video, pattern):
    nd = av.NativeVideoDecoder(test_video["path"])
    try:
        got = nd.read_frames(pattern)
    finally:
        nd.close()
    want = _cv2_frames(test_video["path"], pattern)
    # both backends funnel through ffmpeg's decoder; observed bit-exact,
    # but allow ±2 for swscale rounding differences across builds
    assert got.shape == want.shape
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 2


def test_backward_seek(test_video):
    nd = av.NativeVideoDecoder(test_video["path"])
    try:
        nd.read_frames([200, 201])
        got = nd.read_frames([10, 11])  # forces a backward seek
    finally:
        nd.close()
    want = _cv2_frames(test_video["path"], [10, 11])
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 2


def test_decode_into_staging_buffer(test_video):
    nd = av.NativeVideoDecoder(test_video["path"])
    out = np.zeros((4, test_video["h"], test_video["w"], 3), np.uint8)
    try:
        res = nd.read_frames([0, 1, 2, 3], out=out)
    finally:
        nd.close()
    assert res is out and out[:, :, :, :].any()


def test_executor_runs_on_native_backend(sc, ingested, monkeypatch, tmp_path):
    """The full chunked executor path with the native decoder selected."""
    import scannertools_tpu as st

    monkeypatch.setenv("SCANNERTOOLS_TPU_DECODER", "native")
    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "nat_hist")
    sc.run(sc.io.Output(hist, [out]), st.PerfParams.manual(
        work_packet_size=50, io_packet_size=100))
    rows = list(out.load())
    assert len(rows) == 240
    assert len(rows[0]) == 3 and all(len(c) == 16 for c in rows[0])


def test_audio_roundtrip_aac(tmp_path):
    """Encode mono f32 -> AAC in mp4, decode back; correlation after the
    codec's priming offset must be ~1 (lossy codec, exactness impossible)."""
    rate = 22050
    t = np.arange(rate * 2) / rate
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1313 * t)).astype(np.float32)
    path = str(tmp_path / "tone.m4a")
    av.encode_audio(path, sig, rate)
    dec, got_rate = av.decode_audio(path)
    assert got_rate == rate
    assert len(dec) >= len(sig)
    # find the priming offset by cross-correlation, then demand fidelity
    win = sig[:2048]
    off = max(range(0, 4096), key=lambda o: float(np.dot(dec[o:o + 2048], win)))
    a = dec[off:off + rate]
    b = sig[:rate]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.99


def test_audio_stream_compressed(tmp_path):
    """AudioStream window semantics over a compressed (non-WAV) file:
    element count floor(duration/frame_size), exact frame_size*rate samples
    per element, zero-fill at EOF (audio_source.cpp:176-186)."""
    from scannertools_tpu.storage.audio import AudioStream
    from scannertools_tpu import types as st_types

    rate = 22050
    dur = 2.5
    sig = (0.3 * np.sin(2 * np.pi * 220 * np.arange(int(rate * dur)) / rate)
           ).astype(np.float32)
    path = str(tmp_path / "tone2.m4a")
    av.encode_audio(path, sig, rate)
    stream = AudioStream(path, frame_size=1.0)
    n = len(stream)
    assert n >= 2  # AAC may pad slightly past 2.5s but >= floor(2.5)
    parse = st_types.get_type("array_f32").parse
    rows = [parse(b) for b in stream.load_bytes()]
    assert all(len(r) == rate for r in rows)


def test_video_ingest_native_meta(test_video, tmp_path, monkeypatch):
    """probe() through the native backend agrees with ingest metadata."""
    monkeypatch.setenv("SCANNERTOOLS_TPU_DECODER", "native")
    from scannertools_tpu.io.video import probe

    meta = probe(test_video["path"])
    assert meta.num_frames == test_video["n"]
    assert (meta.height, meta.width) == (test_video["h"], test_video["w"])


def test_audio_extract_segment(test_video, tmp_path):
    """Audio.extract re-encodes a segment via libav (old/video.py parity)."""
    from scannertools_tpu.io.media import Audio

    rate = 22050
    sig = np.sin(2 * np.pi * 330 * np.arange(rate * 3) / rate) \
        .astype(np.float32) * 0.5
    src = str(tmp_path / "full.m4a")
    av.encode_audio(src, sig, rate)
    seg = Audio(src).extract(path=str(tmp_path / "seg"), ext=".m4a",
                             segment=(1.0, 2.0))
    dec, r = av.decode_audio(seg.path())
    assert r == rate
    assert abs(len(dec) - rate) < rate * 0.2  # ~1s ± codec padding


def test_windowed_decode_bit_exact(tmp_path):
    """Sample-accurate windowed decode == the corresponding slice of the
    whole-file decode at every position, incl. stream head and EOF
    zero-fill (audio_source.cpp:104-210 seek semantics)."""
    rate = 22050
    t = np.arange(rate * 3) / rate
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "w.m4a")
    av.encode_audio(path, sig, rate)
    full, _ = av.decode_audio(path)
    for start in (0, 777, rate, len(full) - 300):
        win, r = av.read_audio_window(path, start, rate)
        assert r == rate
        ref = full[start:start + rate]
        if len(ref) < rate:
            ref = np.concatenate(
                [ref, np.zeros(rate - len(ref), np.float32)])
        np.testing.assert_array_equal(win, ref)


def test_audio_stream_sparse_rows_use_windowed_decode(tmp_path):
    """A small rows= request decodes only those windows (cold cache) and
    matches the full-decode path bit-for-bit."""
    from scannertools_tpu.storage.audio import AudioStream
    from scannertools_tpu import types as st_types

    rate = 22050
    sig = (0.3 * np.sin(2 * np.pi * 330 * np.arange(rate * 3) / rate)
           ).astype(np.float32)
    path = str(tmp_path / "s.m4a")
    av.encode_audio(path, sig, rate)
    parse = st_types.get_type("array_f32").parse

    sparse = AudioStream(path, frame_size=0.5)
    got = [parse(b) for b in sparse.load_bytes(rows=[1, 3])]
    assert sparse._cache is None  # windowed path: no full decode happened

    dense = AudioStream(path, frame_size=0.5)
    all_rows = [parse(b) for b in dense.load_bytes()]
    np.testing.assert_array_equal(got[0], all_rows[1])
    np.testing.assert_array_equal(got[1], all_rows[3])


@pytest.mark.parametrize("pattern", [
    list(range(0, 48)),              # one dense run -> equal spans
    [5, 6, 7, 100, 101, 200, 201],   # several seek runs -> run-aligned cut
    [0],                             # fewer indices than workers
    [0, 0, 1, 2, 3],                 # halo-clamped duplicates at the edge
])
def test_parallel_decoder_bit_parity(test_video, pattern):
    """ParallelVideoDecoder (ROADMAP #9): K sub-decoders over disjoint
    contiguous spans must reproduce the single-decoder output exactly,
    including into a caller-provided staging buffer."""
    from scannertools_tpu.io.video import ParallelVideoDecoder

    pd = ParallelVideoDecoder(test_video["path"], threads=3)
    try:
        got = pd.read_frames(pattern)
        buf = np.empty_like(got)
        got2 = pd.read_frames(pattern, out=buf)
    finally:
        pd.close()
    want = _cv2_frames(test_video["path"], pattern)
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 2
    assert got2 is buf and (got2 == got).all()


def test_parallel_decoder_in_pipeline(sc, ingested, video_frames,
                                      monkeypatch):
    """End-to-end: the executor's decode path with forced 2-thread parallel
    decode produces the same histograms as the reference golden."""
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    monkeypatch.setenv("SCANNERTOOLS_TPU_DECODE_THREADS", "2")
    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "hist_par_decode")
    sc.run(sc.io.Output(hist, [out]),
           st.PerfParams.manual(work_packet_size=48),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    want = histogram_reference_np(video_frames)
    for i in (0, 47, 48, 239):
        assert (np.stack(got[i]) == want[i]).all(), f"frame {i}"
