"""NN-op pipeline mechanics (reference tests/test_all.py:196-215): the
cascade/backbones run with deterministic random weights (no egress), so
these check dataflow, types, and output contracts — accuracy is covered by
weight-porting parity tests in test_models.py."""

import numpy as np


def test_faces_objects_gender_pipeline(sc, ingested):
    import scannertools_tpu as st
    from scannertools_tpu.protobufs import BoundingBox

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0, 1]])

    faces = sc.ops.MTCNNDetectFaces(frame=g)
    embs = sc.ops.EmbedFaces(frame=g, bboxes=faces)
    genders = sc.ops.DetectGender(frame=g, bboxes=faces)
    objs = sc.ops.DetectObjects(frame=g)

    out_f = st.NamedStream(sc, "faces")
    out_e = st.NamedStream(sc, "embs")
    out_g = st.NamedStream(sc, "genders")
    out_o = st.NamedStream(sc, "objs")
    pp = st.PerfParams.manual(work_packet_size=2)
    sc.run(sc.io.Output(faces, [out_f]), pp, cache_mode=st.CacheMode.Overwrite)
    sc.run(sc.io.Output(embs, [out_e]), pp, cache_mode=st.CacheMode.Overwrite)
    sc.run(sc.io.Output(genders, [out_g]), pp,
           cache_mode=st.CacheMode.Overwrite)
    sc.run(sc.io.Output(objs, [out_o]), pp, cache_mode=st.CacheMode.Overwrite)

    face_lists = list(out_f.load())
    assert len(face_lists) == 2
    for fl in face_lists:
        for b in fl:
            assert isinstance(b, BoundingBox)
            assert 0.0 <= b.x1 <= 1.0 and 0.0 <= b.y2 <= 1.0

    emb_lists = list(out_e.load())
    for fl, el in zip(face_lists, emb_lists):
        assert el.shape == (len(fl), 128) and el.dtype == np.float32

    gender_lists = list(out_g.load())
    for fl, gl in zip(face_lists, gender_lists):
        assert len(gl) == len(fl)
        assert all(g in ("M", "F") for g in gl)

    obj_lists = list(out_o.load())
    # reference contract: exactly 100 boxes per frame (object_detection.py:47)
    assert all(len(ol) == 100 for ol in obj_lists)
    assert all(isinstance(b.label, int) for ol in obj_lists for b in ol[:3])
