"""Legacy-extra ops: media handles, crop classify, landmarks, alignment."""

import numpy as np


def test_video_media_handle(test_video):
    from scannertools_tpu.io.media import Video

    v = Video(test_video["path"])
    assert v.num_frames() == test_video["n"]
    assert (v.width(), v.height()) == (test_video["w"], test_video["h"])
    f = v.frame(number=10)
    assert f.shape == (test_video["h"], test_video["w"], 3)
    f2 = v.frame(time=10 / v.fps())
    assert (f == f2).all()
    m = v.montage([0, 10, 20, 30], cols=2)
    assert m.shape == (2 * test_video["h"], 2 * test_video["w"], 3)


def test_crop_classify_and_landmarks(sc, ingested):
    import scannertools_tpu as st
    from scannertools_tpu.protobufs import BoundingBox

    dets = [[BoundingBox(x1=0.1, y1=0.1, x2=0.6, y2=0.6, score=1.0)]]

    @st.register_python_op(name="OneDet", outputs=("object",))
    def one_det(ctx, frames):
        return [dets[0] for _ in range(len(frames))]

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    d = sc.ops.OneDet(frames=g)
    clothing = sc.ops.DetectClothing(frame=g, bboxes=d)
    lmk = sc.ops.DetectFaceLandmarks(frame=g, bboxes=d)
    o1 = st.NamedStream(sc, "clothing")
    o2 = st.NamedStream(sc, "landmarks")
    pp = st.PerfParams.manual(work_packet_size=1)
    sc.run(sc.io.Output(clothing, [o1]), pp, cache_mode=st.CacheMode.Overwrite)
    sc.run(sc.io.Output(lmk, [o2]), pp, cache_mode=st.CacheMode.Overwrite)

    from scannertools_tpu.ops.legacy_extras import CLOTHING_CATEGORIES

    got = next(o1.load())
    assert len(got) == 1 and got[0] in CLOTHING_CATEGORIES
    lm = next(o2.load())
    assert lm[0].shape == (5, 2)


def test_transcript_aligner_recovers_offset():
    from scannertools_tpu.ops.legacy_extras import TranscriptAligner
    from scannertools_tpu.storage.captions import Caption

    rate = 8000
    rng = np.random.default_rng(0)
    # 60s audio: speech bursts at known times
    samples = np.zeros(60 * rate, np.float32)
    speech_at = [(5, 8), (15, 20), (30, 36), (45, 50)]
    for a, b in speech_at:
        samples[a * rate:b * rate] = rng.normal(0, 0.5, (b - a) * rate)
    # captions shifted 4 seconds EARLY relative to the audio
    caps = [Caption(i, a - 4.0, b - 4.0, "x")
            for i, (a, b) in enumerate(speech_at)]
    aligner = TranscriptAligner(win_size=0.5, max_shift=10.0)
    aligned, off = aligner.align(samples, rate, caps)
    assert abs(off - 4.0) <= 1.0, off
    assert abs(aligned[0].start - 5.0) <= 1.0
