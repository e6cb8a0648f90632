"""Multi-source graphs: N row-aligned Inputs zipped through one job
(reference: the engine's N-input jobs, exercised by audio + caption zips in
old/test_audio.py:7-29 / old/audio.py:4-30)."""

import json
import wave

import numpy as np
import pytest


def _write_wav(path, rate=8000, dur=4.0):
    t = np.arange(int(rate * dur)) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())


SRT = """1
00:00:00,500 --> 00:00:00,900
first

2
00:00:02,100 --> 00:00:02,900
second
"""


def test_zip_audio_and_captions(sc, tmp_path):
    """The reference pattern: one op consuming an audio frame and the
    caption window covering the same second (old/test_audio.py:7-29)."""
    import scannertools_tpu as st

    wav = str(tmp_path / "a.wav")
    _write_wav(wav, dur=4.0)
    srt = str(tmp_path / "c.srt")
    with open(srt, "w") as f:
        f.write(SRT)

    audio = st.AudioStream(wav, frame_size=1.0)          # 4 rows
    caps = st.CaptionStream(srt, window_size=1.0, max_time=4.0)  # 4 rows

    @st.register_python_op(name="ZipAC", outputs=("object",))
    def zip_ac(ctx, audio_frames, caption_windows):
        out = []
        for a, c in zip(audio_frames, caption_windows):
            wins = json.loads(bytes(c).decode())
            out.append({
                "rms": float(np.sqrt(np.mean(a.astype(np.float64) ** 2))),
                "lines": [w["line"] for w in wins],
            })
        return out

    node = sc.ops.ZipAC(audio_frames=sc.io.Input([audio]),
                        caption_windows=sc.io.Input([caps]))
    out = st.NamedStream(sc, "zip_ac")
    sc.run(sc.io.Output(node, [out]),
           st.PerfParams.manual(work_packet_size=3),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == 4
    assert got[0]["lines"] == ["first"]
    assert got[2]["lines"] == ["second"]
    assert got[1]["lines"] == [] and got[3]["lines"] == []
    assert all(0.3 < g["rms"] < 0.4 for g in got)  # 0.5-amplitude sine


def test_zip_video_and_python_metadata(sc, ingested):
    """Device source (video frames) + host source (python rows) in one
    graph: frames go through a device op while the python rows join at a
    host op."""
    import scannertools_tpu as st

    n = len(ingested)
    tags = st.PythonStream([f"tag{i}" for i in range(n)])

    @st.register_python_op(name="JoinTag", outputs=("object",))
    def join_tag(ctx, hists, tag_rows):
        return [{"tag": t, "total": int(np.sum(h))}
                for h, t in zip(hists, tag_rows)]

    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    node = sc.ops.JoinTag(hists=hist, tag_rows=sc.io.Input([tags]))
    out = st.NamedStream(sc, "zip_vp")
    sc.run(sc.io.Output(node, [out]),
           st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == n
    assert got[0]["tag"] == "tag0" and got[n - 1]["tag"] == f"tag{n - 1}"
    m = ingested.metadata()
    assert all(g["total"] == 3 * m.width * m.height for g in got)


def test_mismatched_row_counts_raise(sc):
    import scannertools_tpu as st

    a = st.PythonStream([1, 2, 3])
    b = st.PythonStream([1, 2])

    @st.register_python_op(name="ZipBad", outputs=("object",))
    def zip_bad(ctx, xs, ys):
        return [x + y for x, y in zip(xs, ys)]

    node = sc.ops.ZipBad(xs=sc.io.Input([a]), ys=sc.io.Input([b]))
    out = st.NamedStream(sc, "zip_bad")
    with pytest.raises(ValueError, match="zip rows 1:1"):
        sc.run(sc.io.Output(node, [out]), st.PerfParams.estimate(),
               cache_mode=st.CacheMode.Overwrite)
