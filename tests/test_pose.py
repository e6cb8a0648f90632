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


# --------------------------------------------------------------- oracle
# Independent transcription of the reference's connect_limbs_coco
# (cpm2_output_kernel_cpu.cpp:463-760): literal nested loops from the PAF
# maps + peak lists, the pattern of tests/test_shot_detection.py's
# _reference_boundaries. group_people/limb_scores are pinned to this.

def _oracle_connect_limbs_coco(paf, peaks, valid, thre=0.05, min_above=9,
                               min_cnt=3, min_score=0.4, max_people=96):
    import math

    from scannertools_tpu.models.pose import LIMB_SEQ, PAF_IDX

    H, W, _ = paf.shape
    K = peaks.shape[1]
    subset = []
    for k, (pa, pb) in enumerate(LIMB_SEQ):
        cxc, cyc = PAF_IDX[k]
        map_x, map_y = paf[:, :, cxc], paf[:, :, cyc]
        cand_a = [i for i in range(K) if valid[pa, i]]
        cand_b = [j for j in range(K) if valid[pb, j]]
        na, nb = len(cand_a), len(cand_b)
        if na == 0 and nb == 0:
            continue
        if na == 0:  # :504-533
            for j in cand_b:
                if not any(r["parts"].get(pb) == j for r in subset):
                    subset.append({"parts": {pb: j}, "cnt": 1,
                                   "score": float(peaks[pb, j, 2])})
            continue
        if nb == 0:  # :534-562
            for i in cand_a:
                if not any(r["parts"].get(pa) == i for r in subset):
                    subset.append({"parts": {pa: i}, "cnt": 1,
                                   "score": float(peaks[pa, i, 2])})
            continue
        temp = []
        f32 = np.float32
        for i in cand_a:  # :566-620 (C++ float math -> float32 here)
            for j in cand_b:
                sx, sy = f32(peaks[pa, i, 0]), f32(peaks[pa, i, 1])
                dx = f32(f32(peaks[pb, j, 0]) - sx)
                dy = f32(f32(peaks[pb, j, 1]) - sy)
                norm = f32(math.sqrt(f32(dx * dx + dy * dy)))
                if norm < 1e-6:
                    continue
                vx, vy = f32(dx / norm), f32(dy / norm)
                ssum, c10 = f32(0.0), 0
                for lm in range(10):
                    t = f32(f32(lm) / f32(10.0))
                    mx = int(math.floor(f32(sx + f32(dx * t)) + 0.5))
                    my = int(math.floor(f32(sy + f32(dy * t)) + 0.5))
                    mx, my = min(mx, W - 1), min(my, H - 1)
                    sc = f32(f32(vx * map_x[my, mx])
                             + f32(vy * map_y[my, mx]))
                    if sc > thre:
                        ssum = f32(ssum + sc)
                        c10 += 1
                if c10 > min_above:
                    temp.append((i, j, float(ssum) / c10))
        temp.sort(key=lambda r: -r[2])  # ColumnCompare on score (:41-46)
        num = min(na, nb)
        conns, occ_a, occ_b = [], set(), set()
        for i, j, sc in temp:  # :631-646
            if len(conns) == num:
                break
            if i not in occ_a and j not in occ_b:
                conns.append((i, j, sc))
                occ_a.add(i)
                occ_b.add(j)
        if k == 0:  # :650-666
            for i, j, sc in conns:
                subset.append({"parts": {pa: i, pb: j}, "cnt": 2,
                               "score": float(peaks[pa, i, 2])
                               + float(peaks[pb, j, 2]) + sc})
        else:  # :687-720
            for i, j, sc in conns:
                found = 0
                for r in subset:
                    if r["parts"].get(pa) == i:
                        r["parts"][pb] = j
                        r["cnt"] += 1
                        r["score"] += float(peaks[pb, j, 2]) + sc
                        found += 1
                if found == 0:
                    subset.append({"parts": {pa: i, pb: j}, "cnt": 2,
                                   "score": float(peaks[pa, i, 2])
                                   + float(peaks[pb, j, 2]) + sc})
    people = []
    for r in subset:  # :726-750
        if r["cnt"] >= min_cnt and r["score"] / r["cnt"] > min_score:
            kp = np.zeros((18, 3), np.float32)
            for part, pk in r["parts"].items():
                kp[part] = peaks[part, pk]
            people.append((r["score"] / r["cnt"], kp))
            if len(people) == max_people:
                break
    return people


def _run_both(heat, paf):
    """Device path (find_peaks -> limb_scores -> group_people) and the
    numpy oracle, from the same maps."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import pose as P

    peaks, valid = jax.jit(P.find_peaks)(jnp.asarray(heat))
    scores = jax.jit(P.limb_scores)(jnp.asarray(paf), peaks, valid)
    peaks, valid = np.asarray(peaks), np.asarray(valid)
    got = P.group_people(peaks, valid, np.asarray(scores))
    want = _oracle_connect_limbs_coco(paf, peaks, valid)
    return got, want


def _assert_people_match(got, want):
    assert len(got) == len(want), (len(got), len(want))
    for (gs, gkp), (ws, wkp) in zip(got, want):
        assert abs(gs - ws) < 1e-4
        np.testing.assert_allclose(gkp, wkp, atol=1e-4)


def _draw_limb(paf, cx_ch, cy_ch, x0, y0, x1, y1, width=2, mag=1.0):
    """Rasterize a unit PAF corridor from (x0,y0) to (x1,y1)."""
    n = max(abs(x1 - x0), abs(y1 - y0)) * 4 + 8
    d = np.asarray([x1 - x0, y1 - y0], np.float32)
    u = d / (np.linalg.norm(d) + 1e-8)
    for t in np.linspace(0.0, 1.0, int(n)):
        px, py = x0 + t * d[0], y0 + t * d[1]
        ys = slice(max(0, int(py) - width), int(py) + width + 1)
        xs = slice(max(0, int(px) - width), int(px) + width + 1)
        paf[ys, xs, cx_ch] = u[0] * mag
        paf[ys, xs, cy_ch] = u[1] * mag


@pytest.mark.slow
def test_paf_grouping_oracle_crowded_three_people():
    """Three overlapping people with full upper bodies; greedy assignment
    order decided by PAF strength must match the oracle."""
    from scannertools_tpu.models import pose as P

    H, W = 64, 96
    heat = np.zeros((H, W, P.N_HEAT), np.float32)
    paf = np.zeros((H, W, P.N_PAF), np.float32)
    # people at close x positions; strengths differ per person
    for p, (x, mag) in enumerate([(24, 1.0), (36, 0.9), (48, 0.8)]):
        heat[40, x, 1] = 0.9 - 0.05 * p      # neck
        heat[24, x, 0] = 0.85 - 0.05 * p     # nose
        heat[40, x - 8, 2] = 0.8 - 0.05 * p  # r-shoulder
        heat[40, x + 7, 5] = 0.8 - 0.05 * p  # l-shoulder
        _draw_limb(paf, 28, 29, x, 40, x, 24, mag=mag)      # neck->nose
        _draw_limb(paf, 12, 13, x, 40, x - 8, 40, mag=mag)  # neck->rsho
        _draw_limb(paf, 20, 21, x, 40, x + 7, 40, mag=mag)  # neck->lsho
    got, want = _run_both(heat, paf)
    _assert_people_match(got, want)
    assert len(got) == 3


def test_paf_grouping_oracle_shared_peak():
    """Two necks compete for ONE shared nose peak: greedy must hand it to
    the stronger-integral neck; the loser keeps a nose-less subset. Both
    paths must agree."""
    from scannertools_tpu.models import pose as P

    H, W = 64, 96
    heat = np.zeros((H, W, P.N_HEAT), np.float32)
    paf = np.zeros((H, W, P.N_PAF), np.float32)
    heat[24, 40, 0] = 0.9                    # the single nose
    for x, mag in [(32, 1.0), (48, 0.7)]:
        heat[40, x, 1] = 0.9                 # neck
        heat[40, x - 6, 2] = 0.8             # r-shoulder
        heat[40, x + 6, 5] = 0.8             # l-shoulder
        _draw_limb(paf, 28, 29, x, 40, 40, 24, mag=mag)     # neck->nose
        _draw_limb(paf, 12, 13, x, 40, x - 6, 40, mag=mag)
        _draw_limb(paf, 20, 21, x, 40, x + 6, 40, mag=mag)
    got, want = _run_both(heat, paf)
    _assert_people_match(got, want)
    assert len(got) == 2
    # exactly one person owns the shared nose
    noses = [kp[0, 2] > 0 for _, kp in got]
    assert sum(noses) == 1


@pytest.mark.slow
def test_paf_grouping_oracle_chain_and_overwrite():
    """Limb chain across many limbs (neck->hip->knee->ankle) plus a
    second, later limb targeting an already-set part (ear via both
    nose->ear and shoulder->ear routes) — exercises the reference's
    overwrite/cnt bookkeeping that simple merges get wrong."""
    from scannertools_tpu.models import pose as P

    H, W = 96, 96
    heat = np.zeros((H, W, P.N_HEAT), np.float32)
    paf = np.zeros((H, W, P.N_PAF), np.float32)
    x = 48
    pts = {1: (x, 30), 0: (x, 16), 8: (x - 6, 50), 9: (x - 6, 70),
           10: (x - 6, 88), 2: (x - 10, 30), 16: (x - 4, 10), 14: (x - 2, 12)}
    for part, (px, py) in pts.items():
        heat[py, px, part] = 0.9
    # neck->nose, neck->rhip->rknee->rankle
    _draw_limb(paf, 28, 29, x, 30, x, 16)
    _draw_limb(paf, 0, 1, x, 30, x - 6, 50)
    _draw_limb(paf, 2, 3, x - 6, 50, x - 6, 70)
    _draw_limb(paf, 4, 5, x - 6, 70, x - 6, 88)
    # neck->rshoulder; nose->reye->rear AND rshoulder->rear (limb 17
    # re-assigns part 16 after limb 14 already set it)
    _draw_limb(paf, 12, 13, x, 30, x - 10, 30)
    _draw_limb(paf, 30, 31, x, 16, x - 2, 12)         # nose->reye
    _draw_limb(paf, 34, 35, x - 2, 12, x - 4, 10)     # reye->rear
    _draw_limb(paf, 18, 19, x - 10, 30, x - 4, 10)    # rsho->rear
    got, want = _run_both(heat, paf)
    _assert_people_match(got, want)
    assert len(got) == 1


@pytest.mark.slow
def test_paf_grouping_oracle_fuzz():
    """Random smooth PAF fields + random peaks over several seeds: the
    device+host path must reproduce the oracle decision-for-decision."""
    from scannertools_tpu.models import pose as P

    H, W = 48, 64
    for seed in range(4):
        rng = np.random.default_rng(seed)
        heat = np.zeros((H, W, P.N_HEAT), np.float32)
        n_pk = rng.integers(1, 4, P.N_PARTS)
        for part in range(P.N_PARTS):
            for _ in range(n_pk[part]):
                y, x = rng.integers(4, H - 4), rng.integers(4, W - 4)
                heat[y, x, part] = float(rng.uniform(0.3, 1.0))
        # smooth continuous random PAF: exact candidate-score ties (which
        # make greedy order depend on f32-vs-f64 rounding) have measure
        # zero, unlike quantized fields
        try:
            from scipy.ndimage import gaussian_filter
            paf = np.stack([
                gaussian_filter(rng.normal(size=(H, W)), 4.0)
                for _ in range(P.N_PAF)], axis=-1)
        except ImportError:
            coarse = rng.normal(size=(H // 8 + 1, W // 8 + 1, P.N_PAF))
            yi = np.linspace(0, H // 8, H)
            xi = np.linspace(0, W // 8, W)
            y0 = np.clip(yi.astype(int), 0, H // 8 - 1)
            x0 = np.clip(xi.astype(int), 0, W // 8 - 1)
            fy = (yi - y0)[:, None, None]
            fx = (xi - x0)[None, :, None]
            paf = ((1 - fy) * (1 - fx) * coarse[y0][:, x0]
                   + (1 - fy) * fx * coarse[y0][:, x0 + 1]
                   + fy * (1 - fx) * coarse[y0 + 1][:, x0]
                   + fy * fx * coarse[y0 + 1][:, x0 + 1])
        paf = (paf * 6.0).astype(np.float32)
        got, want = _run_both(heat, paf)
        _assert_people_match(got, want)
