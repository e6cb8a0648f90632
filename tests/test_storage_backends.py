"""Storage backend tests mirroring the reference's storage roundtrips
(tests/test_all.py:20-137: files source→Pass→files sink, python source
pickle roundtrip, audio via DiscardFrame, captions via DecodeCap)."""

import json
import os
import struct
import wave

import numpy as np
import pytest


def test_files_roundtrip(sc, tmp_path):
    """files source -> Pass -> files sink (tests/test_all.py:64-118)."""
    import scannertools_tpu as st

    in_paths, out_paths = [], []
    for i in range(4):
        p = str(tmp_path / f"in_{i}.bin")
        with open(p, "wb") as f:
            f.write(struct.pack("=Q", i))
        in_paths.append(p)
        out_paths.append(str(tmp_path / f"out_{i}.bin"))

    ins = st.FilesStream(in_paths)
    outs = st.FilesStream(out_paths)
    data = sc.io.Input([ins])
    passed = sc.ops.Pass(elements=data)
    sc.run(sc.io.Output(passed, [outs]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)

    assert outs.committed()
    for i, p in enumerate(out_paths):
        (v,) = struct.unpack("=Q", open(p, "rb").read())
        assert v == i


def test_python_stream_roundtrip(sc):
    """python source pickle roundtrip (tests/test_all.py:122-137)."""
    import scannertools_tpu as st

    data = [{"a": i, "b": [i, i + 1]} for i in range(7)]
    ins = st.PythonStream(data)

    @st.register_python_op(name="PyIdentity", outputs=("object",))
    def py_identity(ctx, elements):
        return list(elements)

    node = sc.ops.PyIdentity(elements=sc.io.Input([ins]))
    out = st.NamedStream(sc, "pyrt")
    sc.run(sc.io.Output(node, [out]), st.PerfParams.manual(work_packet_size=3),
           cache_mode=st.CacheMode.Overwrite)
    assert list(out.load()) == data


def test_audio_stream(sc, tmp_path):
    """wav -> fixed frame_size f32 frames, zero-filled at EOF
    (audio_source.cpp:104-210 semantics)."""
    import scannertools_tpu as st

    rate = 8000
    dur = 3.7
    t = np.arange(int(rate * dur)) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    wav_path = str(tmp_path / "a.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())

    stream = st.AudioStream(wav_path, frame_size=1.0)
    assert len(stream) == 3  # floor(3.7 / 1.0)
    frames = list(stream.load())
    assert all(f.shape == (8000,) and f.dtype == np.float32 for f in frames)
    # sample-accurate alignment
    want = sig[8000:16000].astype(np.float32) / 32768.0
    assert np.allclose(frames[1], want, atol=1e-6)

    # through the pipeline with Discard (tests/test_all.py:20-25)
    node = sc.ops.Discard(elements=sc.io.Input([stream]))
    out = st.NamedStream(sc, "audio_discard")
    sc.run(sc.io.Output(node, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    assert len(out) == 3


SRT = """1
00:00:01,000 --> 00:00:04,000
Hello world

2
00:00:12,500 --> 00:00:15,000
Second caption
spanning two lines

3
00:01:00,000 --> 00:01:05,000
Third
"""


def test_caption_stream(sc, tmp_path):
    """SRT windowing: floor(max_time/ws) elements; JSON per window keyed by
    caption start time (captions_source.cpp:153-155,214-237)."""
    import scannertools_tpu as st

    p = str(tmp_path / "c.srt")
    with open(p, "w") as f:
        f.write(SRT)

    stream = st.CaptionStream(p, window_size=10.0, max_time=95.0)
    assert len(stream) == 9
    wins = [json.loads(b.decode()) for b in stream.load_bytes()]
    assert [c["line"] for c in wins[0]] == ["Hello world"]
    assert [c["line"] for c in wins[1]] == ["Second caption spanning two lines"]
    assert wins[2] == []
    assert [c["line"] for c in wins[6]] == ["Third"]
    assert wins[0][0]["start"] == 1.0 and wins[0][0]["end"] == 4.0


def test_packed_file_stream(sc, tmp_path):
    import scannertools_tpu as st
    from scannertools_tpu.storage.packed_format import write_packed

    p = str(tmp_path / "x.pack")
    write_packed(p, [b"a", b"bb", b"ccc"])
    stream = st.PackedFileStream(p)
    assert len(stream) == 3
    assert list(stream.load_bytes([2, 0])) == [b"ccc", b"a"]

    # as a sink
    out = st.PackedFileStream(str(tmp_path / "y.pack"))
    node = sc.ops.Pass(elements=sc.io.Input([stream]))
    sc.run(sc.io.Output(node, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    assert list(out.load_bytes()) == [b"a", b"bb", b"ccc"]


def test_kernel_class_python_op(sc):
    """Kernel-class lifecycle (scannerpy.Kernel: fetch_resources /
    setup_with_resources / execute)."""
    import scannertools_tpu as st

    events = []

    @st.register_python_op(name="LifecycleKernel", outputs=("object",))
    class LifecycleKernel(st.Kernel):
        def fetch_resources(self):
            events.append("fetch")

        def setup_with_resources(self):
            events.append("setup")

        def execute(self, elements):
            return [e * 2 for e in elements]

    ins = st.PythonStream([1, 2, 3, 4, 5])
    node = sc.ops.LifecycleKernel(elements=sc.io.Input([ins]))
    out = st.NamedStream(sc, "lifecycle")
    sc.run(sc.io.Output(node, [out]), st.PerfParams.manual(work_packet_size=2),
           cache_mode=st.CacheMode.Overwrite)
    assert list(out.load()) == [2, 4, 6, 8, 10]
    # kernel instance cached across chunks: one fetch+setup total
    assert events == ["fetch", "setup"]