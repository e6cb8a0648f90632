"""Shot-boundary detection (reference TestShotDetection,
tests/test_all.py:222-233 — golden boundary count on a known video)."""

import numpy as np


def _reference_boundaries(hists, window=500):
    """Direct transcription of the reference algorithm's *semantics*
    (shot_detection.py:12-28) as the test oracle."""
    n = hists.shape[0]
    diffs = np.array([
        np.mean([np.abs(hists[i - 1][j].astype(np.int64)
                        - hists[i][j].astype(np.int64)).max()
                 for j in range(3)])
        for i in range(1, n)
    ])
    diffs = np.insert(diffs, 0, 0)
    out = []
    for i in range(1, n):
        w = diffs[max(i - window, 0):min(i + window, n)]
        if diffs[i] - np.mean(w) > 2.5 * np.std(w):
            out.append(i)
    return out


def test_vectorized_matches_reference_formula():
    from scannertools_tpu.ops.shot_detection import boundaries_from_histograms

    rng = np.random.default_rng(1)
    # random histograms with injected jumps
    hists = rng.integers(0, 50, size=(300, 3, 16)).astype(np.int32)
    for cut in (40, 77, 210):
        hists[cut:] += rng.integers(100, 200, size=(3, 16)).astype(np.int32)
    got = boundaries_from_histograms(hists, window_size=100)
    want = _reference_boundaries(hists, window=100)
    assert got == want


def test_shot_detection_pipeline(sc, ingested, test_video):
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    ranged = sc.streams.Range(frame, [(0, test_video["n"])])
    hist = sc.ops.Histogram(frame=ranged)
    bounds = sc.ops.ShotBoundaries(histograms=hist)
    out = st.NamedStream(sc, "shots")
    sc.run(sc.io.Output(bounds, [out]),
           st.PerfParams.manual(work_packet_size=50, io_packet_size=50),
           cache_mode=st.CacheMode.Overwrite)

    assert len(out) == test_video["n"]
    found = next(out.load(rows=[0]))
    # ground truth: the synthetic video's cuts
    assert found == test_video["cuts"], found


def test_shot_detection_empty_stream(sc, ingested):
    """Whole-stream op over an empty sampled range commits a 0-row stream."""
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Range(frame, [(5, 5)])
    shots = sc.ops.ShotBoundaries(histograms=sc.ops.Histogram(frame=g))
    out = st.NamedStream(sc, "empty_shots")
    sc.run(sc.io.Output(shots, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    assert out.committed() and len(out) == 0
