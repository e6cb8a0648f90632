"""OpenPose face/hand crop sub-networks (openpose_kernel.cpp:108-141
parity): crop nets fill the 130-keypoint layout's face/hand slots.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scannertools_tpu.models import pose as pose_lib
from scannertools_tpu.models import porting_maps as pm
from scannertools_tpu.ops.pose import (Pose, _crop_batch_device, _hand_box,
                                       _write_back, openpose_decode)


def test_crop_mapping_total():
    vf = jax.eval_shape(lambda: pose_lib.init_face_params(
        jax.random.PRNGKey(0)))
    vh = jax.eval_shape(lambda: pose_lib.init_hand_params(
        jax.random.PRNGKey(0)))
    m = pm.openpose_crop_mapping()
    for v in (vf, vh):
        unmapped, extra = pm.coverage_report(v, m)
        assert not unmapped and not extra


def test_crop_keypoints_decode():
    v = pose_lib.init_hand_params(jax.random.PRNGKey(1))
    crops = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) - 0.5)
    kp = np.asarray(pose_lib.crop_keypoints(v, crops,
                                            pose_lib.HAND_KEYPOINTS))
    assert kp.shape == (2, 21, 3)
    assert kp[..., 0].min() >= 0 and kp[..., 0].max() <= 1
    assert kp[..., 1].min() >= 0 and kp[..., 1].max() <= 1


def test_hand_box_geometry():
    kp = np.zeros((Pose.kp_count(), 3), np.float32)
    kp[Pose.RElbow] = (0.5, 0.5, 0.9)
    kp[Pose.RWrist] = (0.5, 0.7, 0.9)
    p = Pose(1.0, kp)
    box = _hand_box(p, Pose.RWrist, Pose.RElbow)
    assert box is not None
    x0, y0, x1, y1, s = box
    # centered past the wrist along the forearm (downward here)
    assert (y0 + y1) / 2 > 0.7
    assert abs((x0 + x1) / 2 - 0.5) < 1e-6
    assert s == pytest.approx(0.9)
    # low-confidence forearm -> no crop
    kp[Pose.RElbow, 2] = 0.0
    assert _hand_box(Pose(1.0, kp), Pose.RWrist, Pose.RElbow) is None


def test_device_crop_pads_gray_outside():
    """Device crop extraction (the replacement for the per-person host cv2
    path) keeps the gray(128)-outside-frame semantics of CPM2Input."""
    frames = np.full((1, 40, 60, 3), 200.0, np.float32)
    items = jnp.asarray([[0, -0.5, -0.5, 0.5, 0.5]], jnp.float32)
    crop = np.asarray(_crop_batch_device(jnp.asarray(frames), items, 16))[0]
    assert crop.shape == (16, 16, 3)
    # top-left quadrant is outside the frame -> gray 128 -> ~0.0 after map
    assert abs(crop[0, 0, 0] - (128 / 255 - 0.5)) < 1e-5
    assert abs(crop[-1, -1, 0] - (200 / 255 - 0.5)) < 1e-5


def test_device_crop_matches_host_reference():
    """Bilinear interior parity vs the (former) host crop path: int-rounded
    pixel corners, cv2-style (i+0.5)*scale-0.5 sampling."""
    import cv2

    def host_crop(frame_f32, box, size):
        h, w = frame_f32.shape[:2]
        x0, y0, x1, y1 = (int(round(box[0] * w)), int(round(box[1] * h)),
                          int(round(box[2] * w)), int(round(box[3] * h)))
        bw, bh = max(x1 - x0, 1), max(y1 - y0, 1)
        out = np.full((bh, bw, 3), 128.0, np.float32)
        sx0, sy0 = max(x0, 0), max(y0, 0)
        sx1, sy1 = min(x1, w), min(y1, h)
        if sx1 > sx0 and sy1 > sy0:
            out[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = \
                frame_f32[sy0:sy1, sx0:sx1]
        out = cv2.resize(out, (size, size), interpolation=cv2.INTER_LINEAR)
        return out / 255.0 - 0.5

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 255, (2, 48, 64, 3)).astype(np.float32)
    boxes = [(0, (0.2, 0.1, 0.7, 0.9)), (1, (0.4, 0.3, 0.9, 0.8))]
    items = jnp.asarray([[fi, *b] for fi, b in boxes], jnp.float32)
    dev = np.asarray(_crop_batch_device(jnp.asarray(frames), items, 24))
    for k, (fi, b) in enumerate(boxes):
        want = host_crop(frames[fi], b, 24)
        # edges can differ by one blend (crop-buffer clamp vs frame read);
        # compare the interior
        np.testing.assert_allclose(dev[k][1:-1, 1:-1], want[1:-1, 1:-1],
                                   atol=2e-3)


def test_write_back_maps_to_frame_coords():
    kp_full = np.zeros((Pose.kp_count(), 3), np.float32)
    crop_kp = np.array([[0.0, 0.0, 0.5], [1.0, 1.0, 0.8]], np.float32)
    _write_back(kp_full, 5, 2, (0.2, 0.4, 0.6, 0.8), crop_kp)
    np.testing.assert_allclose(kp_full[5], [0.2, 0.4, 0.5])
    np.testing.assert_allclose(kp_full[6], [0.6, 0.8, 0.8])
    assert not kp_full[4].any() and not kp_full[7].any()


def test_openpose_decode_fills_face_hand_slots(monkeypatch):
    """Decode with compute_face/compute_hands on a synthetic person: the
    face and both hand slots come back non-zero, the layout round-trips.
    (The body forward is not involved — the decode receives its padded
    peak arrays directly, as it does from the device segment.)"""
    kp = np.zeros((18, 3), np.float32)
    kp[Pose.Nose] = (32, 10, 0.9)
    kp[Pose.REye] = (28, 8, 0.9)
    kp[Pose.LEye] = (36, 8, 0.9)
    kp[Pose.REar] = (26, 9, 0.9)
    kp[Pose.LEar] = (38, 9, 0.9)
    kp[Pose.RElbow] = (20, 30, 0.9)
    kp[Pose.RWrist] = (18, 40, 0.9)
    kp[Pose.LElbow] = (44, 30, 0.9)
    kp[Pose.LWrist] = (46, 40, 0.9)

    monkeypatch.setattr(pose_lib, "group_people",
                        lambda peaks, valid, scores: [(0.9, kp.copy())])
    frames = np.random.RandomState(3).randint(
        0, 255, (1, 64, 64, 3), np.uint8)
    peaks = np.zeros((1, 18, pose_lib.MAX_PEAKS, 3), np.float32)
    valid = np.zeros((1, 18, pose_lib.MAX_PEAKS), bool)
    scores = np.zeros((1, 19, 1, 1), np.float32)
    dims = np.array([[64, 64]], np.int32)
    poses_per_frame = openpose_decode(
        None, peaks, valid, scores, dims, frame=frames,
        compute_face=True, compute_hands=True, crop_net_size=32)
    (p,) = poses_per_frame[0]
    face = p.face_keypoints()
    lh, rh = p.hand_keypoints()
    assert face.shape == (70, 3) and face[:, 2].max() != 0
    assert lh.shape == (21, 3) and lh.any()
    assert rh.shape == (21, 3) and rh.any()
    # face keypoints live inside the (unclamped) face box
    (fx0, fy0), (fx1, fy1), _ = p.face_bbox()
    assert face[:, 0].min() >= fx0 - 1e-5 and face[:, 0].max() <= fx1 + 1e-5
    assert face[:, 1].min() >= fy0 - 1e-5 and face[:, 1].max() <= fy1 + 1e-5
    # serialization keeps the [score, 18|70|21|21 x3] layout
    rt = Pose.deserialize(p.serialize())
    np.testing.assert_allclose(rt.face_keypoints(), face)


# ------------------------------------------------- multi-scale merge oracle
# CMU wrapper contract (openpose_kernel.cpp:94-141 -> op::Wrapper): every
# scale's maps are brought to the MAX scale's resolution and averaged with
# equal weights; peaks are then extracted at that max resolution.

def _fake_body_apply(peak_frac=(0.3, 0.4)):
    """A deterministic stride-8 'net': channel-0 heat is a gaussian bump at
    a fixed FRACTIONAL image position — scale-invariant by construction, so
    the merged peak must land at that fraction of the FULL-resolution map
    (catching merge-at-wrong-resolution and unnormalized-sum bugs)."""
    fx, fy = peak_frac

    def apply(self, variables, x):
        t, h, w, _ = x.shape
        h8, w8 = h // 8, w // 8
        yy = (jnp.arange(h8, dtype=jnp.float32) + 0.5) / h8
        xx = (jnp.arange(w8, dtype=jnp.float32) + 0.5) / w8
        g = jnp.exp(-(((yy[:, None] - fy) * 8) ** 2
                      + ((xx[None, :] - fx) * 8) ** 2))
        heat = jnp.zeros((t, h8, w8, pose_lib.N_HEAT)).at[..., 0].set(g)
        paf = jnp.zeros((t, h8, w8, pose_lib.N_PAF))
        return heat, paf

    return apply


def test_multi_scale_merge_at_max_resolution(monkeypatch):
    """The merged peak must sit at the bump's fractional position in
    FULL-resolution coordinates: merging at a smaller scale's resolution
    would halve the reported coordinates; an unnormalized sum would break
    the score."""
    monkeypatch.setattr(pose_lib.OpenPoseBody, "apply",
                        _fake_body_apply((0.3, 0.4)))
    frames = np.full((1, 96, 128, 3), 128.0, np.float32)
    peaks, valid, _ = jax.jit(
        lambda f: pose_lib.device_stage(None, f, scales=(1.0, 0.5)))(
        jnp.asarray(frames))
    peaks, valid = np.asarray(peaks), np.asarray(valid)
    assert valid[0, 0, 0]
    x, y, score = peaks[0, 0, 0]
    # within half a net stride (the 0.5-scale grid is 16px-coarse before
    # the merge; merging at the wrong resolution would halve x to ~19)
    assert abs(x - 0.3 * 128) <= 4.0, x
    assert abs(y - 0.4 * 96) <= 4.0, y
    # both scales contribute the same unit bump -> the equal-weight
    # average stays near 1.0 (bilinear upsampling of the coarse stride-8
    # grid attenuates the peak ~10%); an unnormalized SUM would give ~1.8
    assert 0.75 <= score <= 1.05, score


def _np_resize_1d_weights(n_in, n_out, kernel):
    """Interpolation weight matrix [n_out, n_in] with jax.image.resize
    semantics: half-pixel centers, out-of-range taps dropped and the
    remaining weights renormalized (verified against jax empirically)."""
    W = np.zeros((n_out, n_in))
    for i in range(n_out):
        pos = (i + 0.5) * n_in / n_out - 0.5
        base = int(np.floor(pos))
        lo, hi = (base - 1, base + 3) if kernel == "cubic" else (base, base + 2)
        for k in range(lo, hi):
            d = abs(pos - k)
            if kernel == "cubic":
                A = -0.5
                w = ((A + 2) * d**3 - (A + 3) * d**2 + 1 if d <= 1
                     else (A * d**3 - 5 * A * d**2 + 8 * A * d - 4 * A
                           if d < 2 else 0.0))
            else:  # linear
                w = max(0.0, 1.0 - d)
            if 0 <= k < n_in:
                W[i, k] = w
        s = W[i].sum()
        if s:
            W[i] /= s
    return W


def _np_resize(m, out_hw, kernel):
    """Independent numpy separable resize of [T,h,w,C] maps (upsampling
    only, so no antialiasing term)."""
    t, h, w, c = m.shape
    Wy = _np_resize_1d_weights(h, out_hw[0], kernel)
    Wx = _np_resize_1d_weights(w, out_hw[1], kernel)
    return np.einsum("Yh,Xw,thwc->tYXc", Wy, Wx, m, optimize=True)


def test_merge_scale_maps_matches_numpy_resize_and_merge_oracle():
    """Output-level oracle for the CMU multi-scale merge (VERDICT r3 #10):
    an independent numpy transcription of resizeAndMerge — cubic-resize
    every smaller scale's RAW net output to the largest scale's net-output
    grid, average there, single linear upsample — must reproduce
    merge_scale_maps. Also proves the old average-of-full-frame-upsamplings
    formulation is NOT what runs (the two differ on this data)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(2, 12, 16, 3)).astype(np.float32)   # scale 1.0
    small = rng.normal(size=(2, 6, 8, 3)).astype(np.float32)    # scale 0.5
    out_hw = (96, 128)

    got = np.asarray(pose_lib.merge_scale_maps(
        [jnp.asarray(base), jnp.asarray(small)], out_hw))

    merged = (base + _np_resize(small, (12, 16), "cubic")) / 2
    want = _np_resize(merged, out_hw, "linear")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # the pre-contract formulation: upsample each scale to full frame,
    # then average — measurably different on the same inputs
    old = (_np_resize(base, out_hw, "linear")
           + _np_resize(small, out_hw, "linear")) / 2
    assert np.abs(old - want).max() > 1e-3


def test_device_stage_multi_scale_runs_net_at_each_scale(monkeypatch):
    """Output-level: device_stage(scales=(1.0, 0.5)) must equal find_peaks
    over the numpy-oracle-merged maps of per-resolution net outputs — i.e.
    the net runs at EACH scale's own resolution and only raw net-output
    grids are merged (openpose_kernel.cpp:94-141 -> op::Wrapper)."""
    rng = np.random.default_rng(5)
    outs = {}

    def fake_apply(self, variables, x):
        t, h, w, _ = x.shape
        key = (h // 8, w // 8)
        if key not in outs:
            r = np.random.default_rng(hash(key) % 2**32)
            outs[key] = (
                r.uniform(0, 1, (t, h // 8, w // 8, pose_lib.N_HEAT))
                .astype(np.float32),
                r.normal(0, 0.1, (t, h // 8, w // 8, pose_lib.N_PAF))
                .astype(np.float32))
        hm, pf = outs[key]
        return jnp.asarray(hm), jnp.asarray(pf)

    monkeypatch.setattr(pose_lib.OpenPoseBody, "apply", fake_apply)
    frames = rng.uniform(0, 255, (1, 64, 80, 3)).astype(np.float32)
    peaks, valid, _ = jax.jit(
        lambda f: pose_lib.device_stage(None, f, scales=(1.0, 0.5)))(
        jnp.asarray(frames))

    # oracle: same fake outputs, numpy merge, device find_peaks
    hm1, pf1 = outs[(8, 10)]
    hm2, pf2 = outs[(4, 5)]
    heat = _np_resize((hm1 + _np_resize(hm2, (8, 10), "cubic")) / 2,
                      (64, 80), "linear")
    want_peaks, want_valid = jax.jit(pose_lib.find_peaks)(
        jnp.asarray(heat[0], jnp.float32))
    np.testing.assert_array_equal(np.asarray(valid[0]),
                                  np.asarray(want_valid))
    np.testing.assert_allclose(np.asarray(peaks[0]),
                               np.asarray(want_peaks), atol=2e-4)


def test_multi_scale_duplicate_scale_equals_single(monkeypatch):
    """scales=(1.0, 1.0) must be IDENTICAL to scales=(1.0,): equal-weight
    averaging, not accumulation."""
    monkeypatch.setattr(pose_lib.OpenPoseBody, "apply",
                        _fake_body_apply((0.6, 0.5)))
    frames = np.full((1, 64, 64, 3), 100.0, np.float32)
    f = jnp.asarray(frames)
    p1, v1, s1 = jax.jit(
        lambda a: pose_lib.device_stage(None, a, scales=(1.0,)))(f)
    p2, v2, s2 = jax.jit(
        lambda a: pose_lib.device_stage(None, a, scales=(1.0, 1.0)))(f)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.slow
def test_pose_upsample_cubic_option():
    """ADVICE r4: ``pose_upsample='cubic'`` applies OpenPose's wrapper
    resize to the net-grid->frame upsample (and the multi-scale merge's
    final resize) — closest CMU fidelity, opt-in; default stays linear
    (the CPM2 single-scale contract)."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import pose as pl

    v = pl.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 3)) * 0.2,
        jnp.float32)
    heat_c, _ = pl.infer_maps(v, x, (32, 32), upsample="cubic")
    hm, _ = pl.OpenPoseBody().apply(v, x)
    want = jax.image.resize(hm, (1, 32, 32, pl.N_HEAT), "cubic")
    np.testing.assert_allclose(np.asarray(heat_c), np.asarray(want),
                               atol=1e-5)
    heat_l, _ = pl.infer_maps(v, x, (32, 32))
    assert np.abs(np.asarray(heat_c) - np.asarray(heat_l)).max() > 1e-6
