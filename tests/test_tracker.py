"""TrackObjects semantics (reference tracker.py:12-80): IoU merge, aging,
drop after 10 unmerged frames, track identity."""

import numpy as np


def _bb(x1, y1, x2, y2):
    from scannertools_tpu.protobufs import BoundingBox

    return BoundingBox(x1=x1, y1=y1, x2=x2, y2=y2, score=1.0)


def _run(frames, dets, tracker="static"):
    from scannertools_tpu.ops.tracker import _track_init, track_objects

    state = _track_init(None)
    out = []
    state, o = track_objects(None, state, frames, dets, tracker=tracker)
    out.extend(o)
    return out, state


def test_track_merge_and_age():
    frames = np.zeros((14, 32, 32, 3), np.uint8)
    # detection appears at frames 0 and 1 (same place), then never again
    dets = [[_bb(5, 5, 15, 15)], [_bb(6, 5, 16, 15)]] + [[] for _ in range(12)]
    out, state = _run(frames, dets)
    # one track only (second detection merged, IoU > 0.25)
    assert len(out[0]) == 1
    assert len(out[1]) == 1
    assert out[1][0].track_id == out[0][0].track_id
    # ages out after 10 unmerged frames: the frame-1 merge resets the clock
    # to 0, ages 1..10 through frame 10, and >10 drops it at frame 11
    assert len(out[10]) == 1
    assert len(out[11]) == 0


def test_track_new_identity_for_disjoint_box():
    frames = np.zeros((3, 32, 32, 3), np.uint8)
    dets = [[_bb(2, 2, 8, 8)], [_bb(20, 20, 28, 28)], []]
    out, _ = _run(frames, dets)
    assert len(out[0]) == 1 and len(out[1]) == 2
    ids = {b.track_id for b in out[1]}
    assert len(ids) == 2


def test_tracker_pipeline_with_python_dets(sc, ingested):
    """frame + python-supplied detections -> TrackObjects -> bboxes sink."""
    import scannertools_tpu as st

    n = 8
    dets = [[_bb(10, 10, 30, 30)]] + [[] for _ in range(n - 1)]
    frame = sc.io.Input([ingested])
    ranged = sc.streams.Range(frame, [(0, n)])

    @st.register_python_op(name="InjectDets", outputs=("object",))
    def inject_dets(ctx, frames):
        t = len(frames) if isinstance(frames, list) else frames.shape[0]
        return [dets[k] for k in range(t)]  # whole range fits in one chunk

    d = sc.ops.InjectDets(frames=ranged)
    tracked = sc.ops.TrackObjects(frames=ranged, bboxes=d, tracker="static")
    out = st.NamedStream(sc, "tracks")
    sc.run(sc.io.Output(tracked, [out]),
           st.PerfParams.manual(work_packet_size=n),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == n
    assert len(got[0]) == 1 and got[0][0].track_id == 0
    assert len(got[5]) == 1  # still alive (age < 10)
