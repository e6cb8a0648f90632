"""Clothing/hairstyle stack (ops/clothing.py, models/streetstyle.py) —
the reference news-anchor pipelines (old/clothing_detection.py,
old/hairstyle_detection.py): crop-window preparation with edge/text
bottom-trimming, multi-head attribute classification, record decoding."""

import numpy as np
import pytest

from scannertools_tpu.models.streetstyle import (CLOTHING_ATTRIBUTES,
                                                 HAIRSTYLE_ATTRIBUTES)
from scannertools_tpu.ops.clothing import (Clothing, HairStyle,
                                           detect_edge_text, _prepare_one)
from scannertools_tpu.protobufs import BoundingBox


def test_detect_edge_text_finds_graphic_boundary():
    """A hard horizontal line (dense Canny edges across the full width)
    below the scan start must be returned as the boundary row."""
    img = np.full((100, 80, 3), 60, np.uint8)
    img[70:] = 220  # chyron band: strong edge at row ~70
    y = detect_edge_text(img, start_y=10)
    assert 67 <= y <= 72


def test_detect_edge_text_finds_text_row():
    """A row of dense vertical strokes (horizontal contrast >96 for >45%
    of pixels) reads as chyron text."""
    img = np.full((100, 80, 3), 50, np.uint8)
    img[80:86, ::2] = 200  # alternating columns: every pixel has a >96
    # neighbor at offset ±1
    y = detect_edge_text(img, start_y=10)
    assert 78 <= y <= 81


def test_detect_edge_text_clean_image_returns_h():
    img = np.full((60, 40, 3), 90, np.uint8)
    assert detect_edge_text(img, start_y=5) == 60


def test_prepare_one_expands_face_to_torso():
    """Face box -> 2w × 4w torso window centered below the face; on a
    clean frame the bottom stays at the clipped window bottom."""
    h, w = 200, 300
    frame = np.full((h, w, 3), 90, np.uint8)
    # face at x 140..160, y 40..60 (20 px): window is 40 wide, 80 tall,
    # top at cy - 80/3 = 50 - 26 = 24
    bb = BoundingBox(x1=140 / w, y1=40 / h, x2=160 / w, y2=60 / h, score=1.0)
    out = _prepare_one(frame, [bb], 0)
    assert out.x1 == pytest.approx(130 / w)
    assert out.x2 == pytest.approx(170 / w)
    assert out.y1 == pytest.approx(24 / h, abs=2 / h)
    assert out.y2 > out.y1 and out.y2 <= (24 + 80 + 1) / h


def test_prepare_one_trims_at_graphic_boundary():
    """A chyron band inside the torso window pulls the crop bottom up to
    the band's first row."""
    h, w = 200, 300
    frame = np.full((h, w, 3), 90, np.uint8)
    frame[90:] = 230  # full-width graphic from row 90
    bb = BoundingBox(x1=140 / w, y1=40 / h, x2=160 / w, y2=60 / h, score=1.0)
    out = _prepare_one(frame, [bb], 0)
    # crop_y1 = 24; band row 90 -> crop-relative 66; reference's bottom
    # mixes crop-relative rows with absolute top (see _prepare_one doc)
    assert out.y2 * h == pytest.approx(66, abs=2)


def test_prepare_one_body_bound_from_person_below():
    """Someone seated below (other.y1 > bbox.y2) caps the crop bottom."""
    h, w = 400, 300
    frame = np.full((h, w, 3), 90, np.uint8)
    bb = BoundingBox(x1=140 / w, y1=40 / h, x2=160 / w, y2=60 / h, score=1.0)
    below = BoundingBox(x1=130 / w, y1=100 / h, x2=170 / w, y2=140 / h)
    out = _prepare_one(frame, [bb, below], 0)
    # body_bound = 100/h absolute; crop_y1 = 24 -> bound row 76
    assert out.y2 * h == pytest.approx(76, abs=2)


def test_prepare_one_malformed_falls_back_to_original():
    """Tiny faces produce <20 px windows -> the original bbox is kept."""
    h, w = 100, 100
    frame = np.full((h, w, 3), 90, np.uint8)
    bb = BoundingBox(x1=0.50, y1=0.50, x2=0.55, y2=0.55, score=0.7)
    out = _prepare_one(frame, [bb], 0)
    assert out is bb


def test_records_decode_to_names():
    c = Clothing(predictions=np.zeros(len(CLOTHING_ATTRIBUTES), np.int32))
    d = c.to_dict()
    assert d["Clothing pattern"] == "solid"
    assert d["Clothing category"] == "shirt"
    assert "Wearing hat?" in str(c)
    hs = HairStyle(predictions=np.array([2, 3, 1], np.int32))
    assert hs.to_dict() == {"Hair color 3": "blond", "Hair color 5": "brown",
                            "Hair length": "medium"}


@pytest.mark.slow
def test_multihead_model_shapes():
    """Trunk returns (scores, features) with one head per attribute —
    the reference classifier protocol (clothing_detection.py:246-253)."""
    import jax

    from scannertools_tpu.models import streetstyle as ss

    rng = jax.random.PRNGKey(0)
    v = ss.init_params_hairstyle(rng)
    x = np.zeros((2, ss.INPUT_SIZE, ss.INPUT_SIZE, 3), np.float32)
    preds = np.asarray(ss.predict_hairstyle(v, x))
    assert preds.shape == (2, len(HAIRSTYLE_ATTRIBUTES))
    for k, (_, vals) in enumerate(HAIRSTYLE_ATTRIBUTES):
        assert 0 <= preds[0, k] < len(vals)


def test_hairstyle_pipeline(sc, ingested):
    """End-to-end DetectHairStyle through the engine."""
    import scannertools_tpu as st

    dets = [[BoundingBox(x1=0.2, y1=0.1, x2=0.7, y2=0.8, score=1.0)]]

    @st.register_python_op(name="OneFace", outputs=("object",))
    def one_face(ctx, frames):
        return [dets[0] for _ in range(len(frames))]

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    d = sc.ops.OneFace(frames=g)
    hs = sc.ops.DetectHairStyle(frame=g, bboxes=d)
    out = st.NamedStream(sc, "hairstyle")
    sc.run(sc.io.Output(hs, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    got = next(out.load())
    assert len(got) == 1 and isinstance(got[0], HairStyle)
    assert set(got[0].to_dict()) == {k for k, _ in HAIRSTYLE_ATTRIBUTES}
