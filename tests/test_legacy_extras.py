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

    from scannertools_tpu.models.streetstyle import CLOTHING_ATTRIBUTES
    from scannertools_tpu.ops.clothing import Clothing

    got = next(o1.load())
    assert len(got) == 1 and isinstance(got[0], Clothing)
    d = got[0].to_dict()
    for key, vals in CLOTHING_ATTRIBUTES:
        assert d[key] in vals
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


def test_align_words_finds_word_boundaries():
    """Per-word DP alignment (gentle-role parity): three noise 'words'
    separated by silences inside one caption window must come back with
    boundaries near the true silences and speech-active scores."""
    from scannertools_tpu.ops.legacy_extras import TranscriptAligner
    from scannertools_tpu.storage.captions import Caption

    rate = 8000
    rng = np.random.default_rng(1)
    samples = np.zeros(10 * rate, np.float32)
    # words at 1.0-2.0, 2.4-4.2, 4.6-5.2 (silence gaps 0.4s)
    spans = [(1.0, 2.0), (2.4, 4.2), (4.6, 5.2)]
    for a, b in spans:
        samples[int(a * rate):int(b * rate)] = \
            rng.normal(0, 0.5, int((b - a) * rate))
    caps = [Caption(0, 1.0, 5.2, "one twotwo three")]
    words = TranscriptAligner().align_words(samples, rate, caps)
    assert [w.word for w in words] == ["one", "twotwo", "three"]
    # monotonic, covering the window
    assert words[0].start < words[0].end <= words[1].start < words[1].end \
        <= words[2].start < words[2].end
    # boundaries near the true silences (within 0.5s)
    assert abs(words[0].end - 2.2) < 0.6
    assert abs(words[1].end - 4.4) < 0.6
    # every word overlaps real speech
    assert all(w.score > 0.3 for w in words)


def test_align_words_silent_window_scores_zero():
    from scannertools_tpu.ops.legacy_extras import TranscriptAligner
    from scannertools_tpu.storage.captions import Caption

    rate = 8000
    rng = np.random.default_rng(2)
    samples = np.zeros(8 * rate, np.float32)
    samples[: 2 * rate] = rng.normal(0, 0.5, 2 * rate)
    # an anchored caption over the real speech pins the global offset at 0;
    # the second caption sits over silence -> its words score ~0
    caps = [Caption(0, 0.0, 2.0, "real speech here"),
            Caption(1, 5.0, 7.0, "ghost words")]
    words = TranscriptAligner().align_words(samples, rate, caps)
    ghost = [w for w in words if w.word in ("ghost", "words")]
    assert len(ghost) == 2
    assert all(w.score < 0.2 for w in ghost)
    real = [w for w in words if w.word in ("real", "speech", "here")]
    assert all(w.score > 0.5 for w in real)
