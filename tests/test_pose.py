"""Pose stack tests: peak finding, PAF grouping on synthetic fields,
Pose type round trip (reference scannertools_caffe tests + pose_detection.py
semantics)."""

import numpy as np
import pytest


def test_find_peaks_device():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import pose as P

    hm = np.zeros((32, 40, P.N_HEAT), np.float32)
    hm[10, 12, 0] = 0.9   # nose peak
    hm[10, 13, 0] = 0.5   # neighbor, not a local max
    hm[20, 30, 1] = 0.7   # neck peak
    hm[5, 5, 2] = 0.05    # below threshold
    peaks, valid = jax.jit(P.find_peaks)(jnp.asarray(hm))
    peaks, valid = np.asarray(peaks), np.asarray(valid)
    assert valid[0].sum() == 1 and valid[1].sum() == 1 and valid[2].sum() == 0
    assert tuple(peaks[0, 0, :2]) == (12.0, 10.0)
    assert tuple(peaks[1, 0, :2]) == (30.0, 20.0)


def test_paf_grouping_two_people():
    """Synthetic PAF: two vertical neck->nose limbs; grouping must produce
    two separate people, never a cross connection."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import pose as P

    H, W = 48, 64
    heat = np.zeros((H, W, P.N_HEAT), np.float32)
    paf = np.zeros((H, W, P.N_PAF), np.float32)
    # limb 12 = (Neck=1 -> Nose=0), PAF channels (28, 29)
    people_x = [16, 48]
    for x in people_x:
        heat[30, x, 1] = 0.9   # neck
        heat[18, x, 0] = 0.9   # nose
        # PAF pointing from neck up to nose: unit vector (0, -1)
        paf[18:31, x - 1 : x + 2, 29] = -1.0
    peaks, valid = jax.jit(P.find_peaks)(jnp.asarray(heat))
    scores = jax.jit(P.limb_scores)(jnp.asarray(paf), peaks, valid)
    people = P.group_people(np.asarray(peaks), np.asarray(valid),
                            np.asarray(scores))
    assert len(people) == 0  # only 2 joints each -> pruned (cnt < 3)

    # add shoulders + PAF for limb 0 (Neck->RShoulder, channels 12,13)
    for x in people_x:
        heat[30, x - 8, 2] = 0.9  # RShoulder to the left
        paf[29:32, x - 8 : x + 1, 12] = -1.0  # pointing -x
    peaks, valid = jax.jit(P.find_peaks)(jnp.asarray(heat))
    scores = jax.jit(P.limb_scores)(jnp.asarray(paf), peaks, valid)
    people = P.group_people(np.asarray(peaks), np.asarray(valid),
                            np.asarray(scores))
    assert len(people) == 2
    for _, kp in people:
        # each person's nose and neck share an x column
        assert abs(kp[0, 0] - kp[1, 0]) < 1.0
        assert kp[2, 2] > 0  # shoulder present


def test_pose_type_roundtrip_and_bboxes():
    from scannertools_tpu.ops.pose import Pose

    kp = np.zeros((Pose.kp_count(), 3), np.float32)
    kp[Pose.Nose] = [0.5, 0.3, 0.9]
    kp[Pose.REye] = [0.45, 0.28, 0.8]
    kp[Pose.LEye] = [0.55, 0.28, 0.8]
    kp[Pose.REar] = [0.4, 0.3, 0.7]
    kp[Pose.LEar] = [0.6, 0.3, 0.7]
    kp[Pose.Neck] = [0.5, 0.45, 0.9]
    p = Pose(0.87, kp)
    buf = p.serialize()
    assert len(buf) == Pose.kp_size() * 4
    q = Pose.deserialize(buf)
    assert abs(q._score - 0.87) < 1e-6
    assert np.allclose(q._kp, kp)

    (x1, y1), (x2, y2), score = q.face_bbox()
    assert x1 < 0.4 and x2 > 0.6 and score == pytest.approx(0.7)
    (bx1, by1), (bx2, by2), _ = q.body_bbox()
    assert by2 >= 0.45

    p2 = Pose(0.5, kp * 1.0)
    assert q.distance_to(p2) == 0.0


def test_openpose_pipeline_mechanics(sc, ingested):
    import scannertools_tpu as st
    from scannertools_tpu.ops.pose import Pose

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    poses = sc.ops.OpenPose(frame=g, pose_num_scales=1)
    out = st.NamedStream(sc, "poses")
    sc.run(sc.io.Output(poses, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    got = list(out.load())
    assert len(got) == 1
    for p in got[0]:
        assert isinstance(p, Pose)


def test_cpm2_chain_and_multiscale(sc, ingested):
    """CPM2Input -> CPM2 -> CPM2Output name-parity chain, plus the
    multi-scale OpenPose path (pose_num_scales=2)."""
    import scannertools_tpu as st
    from scannertools_tpu.ops.pose import Pose

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    pre = sc.ops.CPM2Input(frame=g)
    heat, paf = (n := sc.ops.CPM2(cpm2_input=pre))[0], n[1]
    info = sc.ops.InfoFromFrame(frames=g)
    poses = sc.ops.CPM2Output(cpm2_resized_map=heat, cpm2_joints=paf,
                              original_frame_info=info)
    out = st.NamedStream(sc, "cpm2_poses")
    sc.run(sc.io.Output(poses, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    got = next(out.load())
    assert all(isinstance(p, Pose) for p in got)

    ms = sc.ops.OpenPose(frame=g, pose_num_scales=2, pose_scale_gap=0.1)
    out2 = st.NamedStream(sc, "ms_poses")
    sc.run(sc.io.Output(ms, [out2]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    assert len(list(out2.load())) == 1
