"""Reference semantic goldens with REAL ported checkpoints.

Reference parity: scannertools/tests/test_all.py:196-215 (exactly one face
/ embedding / gender in frame 0 of the reference short_video.mp4) and :233
(exactly 7 shot boundaries in the first 1000 frames).

These run only when the weights-in kit has been executed
(scripts/port_checkpoints.py) and ``ST_WEIGHTS_DIR`` points at its output:

    python scripts/port_checkpoints.py --artifacts DIR
    ST_WEIGHTS_DIR=DIR/ported python -m pytest -m weights tests/
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.weights

WDIR = os.environ.get("ST_WEIGHTS_DIR", "")


def _need(*files):
    if not WDIR:
        pytest.skip("ST_WEIGHTS_DIR not set (run scripts/port_checkpoints.py)")
    missing = [f for f in files if not os.path.exists(os.path.join(WDIR, f))]
    if missing:
        pytest.skip(f"missing ported artifacts: {missing}")
    return [os.path.join(WDIR, f) for f in files]


@pytest.fixture(scope="module")
def sc(tmp_path_factory):
    import scannertools_tpu as st

    return st.Client(db_path=str(tmp_path_factory.mktemp("weights_db")))


@pytest.fixture(scope="module")
def video(sc):
    (path,) = _need("short_video.mp4")
    return sc.ingest_videos([("golden_video", path)])[0]


def test_one_face_in_frame_0(sc, video):
    """tests/test_all.py:196-199: exactly 1 face, a valid BoundingBox."""
    import scannertools_tpu as st
    from scannertools_tpu.protobufs import BoundingBox

    (mtcnn_w,) = _need("mtcnn.npz")
    frame = sc.io.Input([video])
    g = sc.streams.Gather(frame, [[0]])
    faces = sc.ops.MTCNNDetectFaces(frame=g, weights_path=mtcnn_w)
    out = st.NamedStream(sc, "golden_faces")
    sc.run(sc.io.Output(faces, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    (lst,) = list(out.load())
    assert len(lst) == 1
    b = lst[0]
    assert isinstance(b, BoundingBox)
    assert 0.0 <= b.x1 < b.x2 <= 1.0 and 0.0 <= b.y1 < b.y2 <= 1.0


def test_one_embedding_in_frame_0(sc, video):
    """tests/test_all.py:202-207: exactly 1 embedding, 128-d, non-zero."""
    import scannertools_tpu as st

    mtcnn_w, facenet_w = _need("mtcnn.npz", "facenet.npz")
    frame = sc.io.Input([video])
    g = sc.streams.Gather(frame, [[0]])
    faces = sc.ops.MTCNNDetectFaces(frame=g, weights_path=mtcnn_w)
    embs = sc.ops.EmbedFaces(frame=g, bboxes=faces, weights_path=facenet_w)
    out = st.NamedStream(sc, "golden_embs")
    sc.run(sc.io.Output(embs, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    (e,) = list(out.load())
    assert e.shape == (1, 128) and e.dtype == np.float32
    assert float(np.abs(e).sum()) > 0


def test_one_gender_in_frame_0(sc, video):
    """tests/test_all.py:210-215: exactly 1 gender label."""
    import scannertools_tpu as st

    mtcnn_w, gender_w = _need("mtcnn.npz", "gender.npz")
    frame = sc.io.Input([video])
    g = sc.streams.Gather(frame, [[0]])
    faces = sc.ops.MTCNNDetectFaces(frame=g, weights_path=mtcnn_w)
    genders = sc.ops.DetectGender(frame=g, bboxes=faces,
                                  weights_path=gender_w)
    out = st.NamedStream(sc, "golden_genders")
    sc.run(sc.io.Output(genders, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    (gl,) = list(out.load())
    assert len(gl) == 1 and gl[0] in ("M", "F")


def test_seven_shot_boundaries(sc, video):
    """tests/test_all.py:222-233: ShotBoundaries finds exactly 7 cuts in
    the first 1000 frames (weights-free, but needs the reference video)."""
    import scannertools_tpu as st

    _need("short_video.mp4")
    frame = sc.io.Input([video])
    r = sc.streams.Range(frame, [(0, 1000)])
    hist = sc.ops.Histogram(frame=r)
    shots = sc.ops.ShotBoundaries(histograms=hist)
    out = st.NamedStream(sc, "golden_shots")
    sc.run(sc.io.Output(shots, [out]),
           st.PerfParams.manual(work_packet_size=1000, io_packet_size=1000),
           cache_mode=st.CacheMode.Overwrite)
    boundaries = list(out.load())[0]
    assert len(boundaries) == 7


def test_ssd_objects_frame_0(sc, video):
    """object_detection contract with real weights: 100 rows, the top
    detection is a confident (>0.5) known COCO class."""
    import scannertools_tpu as st

    (ssd_w,) = _need("ssd.npz")
    frame = sc.io.Input([video])
    g = sc.streams.Gather(frame, [[0]])
    objs = sc.ops.DetectObjects(frame=g, weights_path=ssd_w)
    out = st.NamedStream(sc, "golden_objs")
    sc.run(sc.io.Output(objs, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    (ol,) = list(out.load())
    assert len(ol) == 100
    assert ol[0].score > 0.5 and 1 <= ol[0].label <= 90
