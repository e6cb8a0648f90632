"""Mask R-CNN mechanics (reference maskrcnn_detection.py:27-330 contract)."""

import numpy as np
import pytest


def test_letterbox_geometry_matches_reference_math():
    """maskrcnn-benchmark Resize.get_size semantics: min side -> 800
    unless the max side would exceed 1333 (maskrcnn_detection.py:27-30)."""
    from scannertools_tpu.models.maskrcnn import letterbox_geometry

    # 480x640: s = 800/480; max side 640*s = 1066.7 < 1333
    s, (th, tw), (ch, cw) = letterbox_geometry(480, 640)
    assert s == pytest.approx(800 / 480)
    assert (th, tw) == (800, 1067)
    assert ch % 32 == 0 and cw % 32 == 0 and ch >= th and cw >= tw
    # 1080x1920: min-side scale would make max side 1422 > 1333 -> cap
    s, (th, tw), _ = letterbox_geometry(1080, 1920)
    assert s == pytest.approx(1333 / 1920)
    assert (th, tw) == (750, 1333)
    # aspect preserved in both cases
    assert th / tw == pytest.approx(1080 / 1920, rel=2e-3)


def test_preprocess_letterbox_content_and_padding():
    """Content region = aspect-preserving resize (BGR, mean-subtracted);
    padded region identically zero (to_image_list zero pad)."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import maskrcnn as mr

    frames = np.random.default_rng(0).integers(
        0, 255, (2, 30, 40, 3)).astype(np.float32)
    imgs, s = mr.preprocess(jnp.asarray(frames), min_size=60, max_size=100)
    # 30x40 -> min side 60 would give max side 80 < 100 -> s=2
    assert s == pytest.approx(2.0)
    th, tw = 60, 80
    assert imgs.shape[1] % 32 == 0 and imgs.shape[2] % 32 == 0
    got = np.asarray(imgs)
    want = np.asarray(jax.image.resize(
        jnp.asarray(frames), (2, th, tw, 3), "linear", antialias=False))
    want = want[..., ::-1] - np.asarray(mr.PIXEL_MEAN)
    np.testing.assert_allclose(got[:, :th, :tw], want, atol=1e-3)
    assert (got[:, th:] == 0).all() and (got[:, :, tw:] == 0).all()


def test_maskrcnn_forward_shapes():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import maskrcnn as mr

    model = mr.MaskRCNNModel(jax.random.PRNGKey(0))

    def run(v, x):
        imgs, _ = mr.preprocess(x, min_size=64, max_size=128)
        return model.infer(v, imgs)

    fn = jax.jit(run)
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 48, 64, 3)).astype(np.float32)
    b, s, l, m = fn(model.variables, jnp.asarray(frames))
    assert np.asarray(b).shape == (1, mr.MAX_DET, 4)
    assert np.asarray(m).shape == (1, mr.MAX_DET, 28, 28)
    assert np.isfinite(np.asarray(b)).all()
    # boxes live inside the canvas
    bb = np.asarray(b)
    assert (bb >= 0).all() and (bb[..., 0::2] <= 96 + 32).all()


def test_maskrcnn_box_roundtrip_through_letterbox():
    """The op forward maps canvas boxes back to normalized original-frame
    coords: a full-canvas-content box must land on [0,1]x[0,1] regardless
    of the frame's aspect (the square-512 distortion class of bug)."""
    import jax.numpy as jnp

    from scannertools_tpu.models import maskrcnn as mr

    h, w = 30, 40
    s, (th, tw), _ = mr.letterbox_geometry(h, w, 60, 100)
    # a detection covering the whole CONTENT region in canvas px
    canvas_box = np.asarray([0.0, 0.0, tw, th], np.float32)
    denom = np.asarray([w * s, h * s, w * s, h * s], np.float32)
    norm = np.clip(canvas_box / denom, 0, 1)
    np.testing.assert_allclose(norm, [0, 0, 1, 1], atol=1e-6)


def test_maskrcnn_op_contract(sc, ingested):
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    dets = sc.ops.MaskRCNNDetectObjects(frame=g, confidence_threshold=0.0,
                                        min_size=64, max_size=128)
    out = st.NamedStream(sc, "mrcnn")
    sc.run(sc.io.Output(dets, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    got = next(out.load())
    assert isinstance(got, list)
    for d in got:
        assert set(d) == {"bbox", "mask"}
        assert d["mask"].shape == (64 // 4, 96 // 4)
        assert 0.0 <= d["bbox"].x1 <= 1.0
