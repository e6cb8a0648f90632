"""Chunk-granular checkpoint/resume (CacheMode.Resume — the SURVEY §5
per-(video, frame-range) shard design; the reference only has table-level
caching, old/prelude.py:241-262)."""

import numpy as np
import pytest


def test_resume_after_mid_job_failure(sc, ingested, video_frames):
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    calls = {"n": 0, "fail_at": 2}

    @st.register_python_op(name="FlakyMark", outputs=("array_i32",))
    def flaky_mark(ctx, hists):
        calls["n"] += 1
        if calls["n"] == calls["fail_at"]:
            raise RuntimeError("injected mid-job failure")
        return [np.asarray(h, np.int32) for h in hists]

    frame = sc.io.Input([ingested])
    g = sc.streams.Range(frame, [(0, 64)])
    hist = sc.ops.Histogram(frame=g)
    marked = sc.ops.FlakyMark(hists=hist)
    out = st.NamedStream(sc, "resume_h")
    pp = st.PerfParams.manual(work_packet_size=16)  # 4 chunks

    with pytest.raises(RuntimeError, match="injected"):
        sc.run(sc.io.Output(marked, [out]), pp,
               cache_mode=st.CacheMode.Resume)
    assert not out.committed()
    # chunk 0 survived as a durable shard (under the run-signature namespace)
    import glob
    import os

    shard0 = glob.glob(os.path.join(out._dir, "shards_*",
                                    "shard_0000000000_*.pack"))
    assert shard0, os.listdir(out._dir)

    # resume: chunk 0 is NOT recomputed, the rest completes
    calls["fail_at"] = -1
    calls_before = calls["n"]
    sc.run(sc.io.Output(marked, [out]), pp, cache_mode=st.CacheMode.Resume)
    assert out.committed() and len(out) == 64
    assert calls["n"] - calls_before == 3  # chunks 1..3 only

    got = np.stack(list(out.load()))
    want = histogram_reference_np(video_frames[:64]).reshape(64, 3, 16)
    assert (got.reshape(64, 3, 16) == want).all()

    # committed output: Resume now skips entirely
    n_before = calls["n"]
    sc.run(sc.io.Output(marked, [out]), pp, cache_mode=st.CacheMode.Resume)
    assert calls["n"] == n_before


def test_resume_falls_back_for_stateful_graphs(sc, ingested):
    """Stateful/whole-stream graphs can't checkpoint per chunk; Resume must
    still produce correct (fully recomputed) results."""
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Range(frame, [(0, 20)])
    shots = sc.ops.ShotBoundaries(histograms=sc.ops.Histogram(frame=g))
    out = st.NamedStream(sc, "resume_ws")
    sc.run(sc.io.Output(shots, [out]),
           st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Resume)
    assert out.committed() and len(out) == 20


def test_resume_shards_invalidated_by_changed_sampling(sc, ingested):
    """Shards from a Range(0,32) run must not be reused by a Range(8,40)
    run even though chunk starts/counts coincide."""
    import scannertools_tpu as st

    calls = {"n": 0, "fail_at": 2}

    @st.register_python_op(name="FlakyMark2", outputs=("array_i32",))
    def flaky_mark2(ctx, hists):
        calls["n"] += 1
        if calls["n"] == calls["fail_at"]:
            raise RuntimeError("boom")
        return [np.asarray(h, np.int32) for h in hists]

    frame = sc.io.Input([ingested])
    out = st.NamedStream(sc, "resume_sig")
    pp = st.PerfParams.manual(work_packet_size=16)

    def graph(lo, hi):
        g = sc.streams.Range(frame, [(lo, hi)])
        return sc.io.Output(
            sc.ops.FlakyMark2(hists=sc.ops.Histogram(frame=g)), [out])

    with pytest.raises(RuntimeError):
        sc.run(graph(0, 32), pp, cache_mode=st.CacheMode.Resume)

    # different sampling, same chunk layout: must recompute all chunks
    calls["fail_at"] = -1
    before = calls["n"]
    sc.run(graph(8, 40), pp, cache_mode=st.CacheMode.Resume)
    assert calls["n"] - before == 2  # both chunks, no foreign-shard reuse
    assert out.committed() and len(out) == 32
